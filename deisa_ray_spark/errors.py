"""Error types mirroring the reference's contract semantics.

Reference: /root/reference/src/deisa/ray/errors.py:5-42 defines
``ContractError`` (undeclared array / bad metadata) and re-raise policy for
``TimeoutError``/``AssertionError`` inside callbacks
(window_handler.py:381-390).
"""

from __future__ import annotations


class DeisaSparkError(Exception):
    """Base class for engine errors."""


class ContractError(DeisaSparkError):
    """A chunk or metadata violates the declared contract.

    Mirrors reference errors.py:5-18 + scheduling_actor.py:281-287
    (undeclared array name) and validate.py:139-163 (bad metadata keys) —
    including the reference's default message and ``.message`` attribute
    (migrated code inspects both)."""

    def __init__(self, message: str = "Contract not satisfied.") -> None:
        super().__init__(message)
        self.message = message


class ConfigError(RuntimeError):
    """Raised when configuration is mutated after it has been locked
    (reference errors.py:21-24)."""


class OrderingError(DeisaSparkError):
    """An older timestep arrived after a newer one was processed.

    Mirrors reference window_handler.py:348-351
    ("Logical flow of data was violated"). The reference *fails the run*
    rather than dropping late data; we preserve that semantics.
    """


def default_exception_handler(e: BaseException) -> None:
    """Print the exception traceback to stderr and move on — the
    reference's DEFAULT callback exception policy (errors.py:27-42,
    window_handler.py:176): a failing analytics callback is reported,
    not fatal. Timeout/AssertionError still escalate before any handler
    runs (A10). The native engine API keeps the stricter
    ``exception_handler=None`` → raise default; the compat layer wires
    THIS one in to match migrated code's expectations."""
    import sys
    import traceback

    traceback.print_exc(file=sys.stderr)
    print(e, file=sys.stderr)
