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
    (undeclared array name) and validate.py:139-163 (bad metadata keys).
    """


class OrderingError(DeisaSparkError):
    """An older timestep arrived after a newer one was processed.

    Mirrors reference window_handler.py:348-351
    ("Logical flow of data was violated"). The reference *fails the run*
    rather than dropping late data; we preserve that semantics.
    """
