"""ValidationWarning — the user-facing violation record.

Byte-compatible with the reference
(/root/reference/pandas_schema/validation_warning.py:6-22): ``__str__``
renders ``{row: R, column: "C"}: "V" MESSAGE`` when row, column and value are
all non-None, else just the message. Falsy-but-not-None values (0, '')
still render the full form — preserved (tested by the reference at
test/test_validation_warning.py:6-30).
"""

from __future__ import annotations


class ValidationWarning:
    """One difference between the schema and the data, found during validation."""

    def __init__(self, message: str, value=None, row: int = -1, column: str = None):
        self.message = message
        self.value = value
        self.row = row
        self.column = column

    def __str__(self) -> str:
        if self.row is not None and self.column is not None and self.value is not None:
            return '{{row: {}, column: "{}"}}: "{}" {}'.format(
                self.row, self.column, self.value, self.message
            )
        else:
            return self.message

    def __repr__(self) -> str:
        return "ValidationWarning(row={!r}, column={!r}, value={!r}, message={!r})".format(
            self.row, self.column, self.value, self.message
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ValidationWarning)
            and self.message == other.message
            and self.value == other.value
            and self.row == other.row
            and self.column == other.column
        )

    def __hash__(self):
        return hash((self.message, str(self.value), self.row, self.column))
