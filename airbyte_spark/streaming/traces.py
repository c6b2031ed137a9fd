"""AirbyteTraceMessage ERROR analogs.

The protocol's trace section (docs/platform/understanding-airbyte/
airbyte-protocol.md, AirbyteErrorTraceMessage) reports every sync
failure with a `failureType` — ``config_error`` (the user's
configuration is wrong; retrying without a change won't help),
``system_error`` (a bug or environmental fault), ``transient_error``
(safe to retry as-is) — plus the message and the stack trace, so an
operator can tell the three apart without reading logs. This module is
that surface for ConnectionSync (streaming/connection.py) and the
`check` operation (lake/check.py).
"""

from __future__ import annotations

import time
import traceback


def classify_failure(exc: BaseException) -> str:
    """Map an exception to the protocol failureType. Conservative:
    anything unrecognized is a system error (the reference treats
    uncategorized throwables the same way)."""
    from airbyte_spark.lake.table import CommitConflict

    config_types: tuple = (ValueError, KeyError, FileNotFoundError)
    try:
        from airbyte_spark.functions.mappers import MapperError

        config_types += (MapperError,)
    except ImportError:  # pragma: no cover
        pass
    try:
        from airbyte_spark.operators.merge import NullPrimaryKeyError

        config_types += (NullPrimaryKeyError,)
    except ImportError:  # pragma: no cover
        pass
    if isinstance(exc, (CommitConflict, TimeoutError, ConnectionError)):
        return "transient_error"
    if isinstance(exc, config_types):
        return "config_error"
    return "system_error"


def error_trace(stream: str | None, exc: BaseException) -> dict:
    """One ERROR trace event: type + failureType + message + first stack
    line (the full trace is one string field in the protocol; keeping the
    head keeps the ledger row bounded)."""
    tb = traceback.format_exception(type(exc), exc, exc.__traceback__)
    stack_head = next(
        (ln.strip() for ln in tb if ln.strip().startswith("File ")), ""
    )
    return {
        "type": "ERROR",
        "stream": stream,
        "failure_type": classify_failure(exc),
        "exception_class": type(exc).__name__,
        "message": str(exc) or type(exc).__name__,
        "stack_first_line": stack_head,
        "ts": time.time(),
    }
