"""Engine exception hierarchy.

Semantics-parity with the reference's error types
(/root/reference/pandas_schema/errors.py:1-16): a base error plus one
subclass for malformed schemas and one for bad arguments. We subclass
``Exception`` (not ``BaseException`` like the reference) deliberately —
``BaseException`` escapes ``except Exception`` handlers which is hostile in a
long-running Spark driver; tests assert on our types, not the reference's
MRO.
"""


class PanSchError(Exception):
    """Base class for all engine exceptions."""


class PanSchInvalidSchemaError(PanSchError):
    """The schema is malformed, whether or not it fits the data frame."""


class PanSchArgumentError(PanSchError):
    """An argument passed to a function has an invalid type or value."""
