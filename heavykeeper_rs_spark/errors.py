"""Error surface mirroring the reference crate's error enums.

Reference parity (see /root/reference, read-only):
- ``HeavyKeeperError::{IncompatibleWidth,IncompatibleDepth,
  IncompatibleDecay,IncompatibleTopItems}`` — src/heavykeeper.rs:39-61
- builder errors ``InvalidWidth/InvalidDepth/InvalidDecay/InvalidK`` —
  src/heavykeeper.rs:63-67, src/bucketed.rs:67-77, src/cuckoo.rs:60-72
- hasher-probe incompatibility (``IncompatibleHasher``) —
  src/bucketed.rs:19,63-65,373-375

We raise Python exceptions with the same granularity so tests can
assert the exact failure mode.
"""

from __future__ import annotations


class HeavyKeeperError(Exception):
    """Base class for all sketch errors."""


class BuilderError(HeavyKeeperError, ValueError):
    """Invalid construction parameters (reference BuilderError)."""


class InvalidK(BuilderError):
    pass


class InvalidWidth(BuilderError):
    pass


class InvalidDepth(BuilderError):
    pass


class InvalidDecay(BuilderError):
    pass


class SketchCompatError(HeavyKeeperError):
    """Merge between incompatible sketches.

    Mirrors HeavyKeeperError::Incompatible{Width,Depth,Decay,TopItems}
    (src/heavykeeper.rs:39-61) plus the hasher probe (seed) check
    (src/bucketed.rs:373-375).
    """

    def __init__(self, field: str, left: object, right: object) -> None:
        self.field = field
        self.left = left
        self.right = right
        super().__init__(
            f"incompatible sketches: {field} differs ({left!r} != {right!r})"
        )
