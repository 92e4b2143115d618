"""Bit-exact replica of ``java.util.Random`` (the 48-bit LCG).

Needed only for reference-parity fixtures: the reference's synthetic
graph generator (CreateSyntheticGraphSeed.java:55-63) draws from two
``java.util.Random`` streams, so reproducing its exact edge tables in
tests requires the same LCG. Public algorithm, documented in the
Java SE ``java.util.Random`` javadoc.
"""

from __future__ import annotations

_MULTIPLIER = 0x5DEECE66D
_ADDEND = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """java.util.Random-compatible PRNG (nextInt/nextDouble only)."""

    __slots__ = ("_seed",)

    def __init__(self, seed: int) -> None:
        self._seed = (seed ^ _MULTIPLIER) & _MASK

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULTIPLIER + _ADDEND) & _MASK
        return self._seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        """java.util.Random.nextInt(bound): uniform in [0, bound)."""
        if bound <= 0:
            raise ValueError("bound must be positive")
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java rejects when bits - val + (bound-1) overflows int32.
            if bits - val + (bound - 1) < (1 << 31):
                return val

    def next_double(self) -> float:
        """java.util.Random.nextDouble(): 53-bit uniform in [0, 1)."""
        return ((self._next(26) << 27) + self._next(27)) * (2.0**-53)
