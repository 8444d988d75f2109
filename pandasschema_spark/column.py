"""Column: (name, validations, allow_empty) — same 3-field API as the
reference (/root/reference/pandas_schema/column.py:8-18)."""

from __future__ import annotations

import typing

import pandas as pd

from .validation import _BaseValidation
from .validation_warning import ValidationWarning


class Column:
    def __init__(
        self,
        name: str,
        validations: typing.Iterable["_BaseValidation"] = [],
        allow_empty: bool = False,
    ):
        self.name = name
        self.validations = list(validations)
        self.allow_empty = allow_empty

    def validate(self, series: pd.Series) -> typing.List[ValidationWarning]:
        """Eager pandas path (parity with reference column.py:20-27):
        flat-map get_errors over this column's validations. The Spark path
        goes through schema.Schema.validate, which compiles all columns'
        checks into one plan instead of looping."""
        return [e for v in self.validations for e in v.get_errors(series, self)]
