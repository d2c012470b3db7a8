"""Property tests for the round-11 banded multi-index Hamming family:
the PIGEONHOLE COMPLETENESS guarantee checked as pure mathematics over
randomized codes (no Spark — the guarantee is a property of the band
decomposition itself, and the Spark join is pinned equal to the
exhaustive semantics separately in test_round11.py), plus the
band-width resolver's contract under randomized (dim, radius) pairs.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


def _bands(code: int, dim: int, band_bits: int) -> list[int]:
    """The reference band decomposition: band b = bits
    [b*band_bits, (b+1)*band_bits) of the code — the same contiguous
    shift+mask split `_explode_bands` performs on the packed words."""
    mask = (1 << band_bits) - 1
    return [
        (code >> (b * band_bits)) & mask for b in range(dim // band_bits)
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=15),
    st.sampled_from([4, 8, 16]),
)
def test_pigeonhole_any_code_within_radius_shares_a_band(
    code, flips, band_bits
):
    """For ANY 64-bit code and ANY set of ≤ n_bands−1 bit flips, the
    flipped code shares at least one exact band with the original —
    the completeness guarantee the banded equi-join relies on. The
    flip budget is capped at the band count minus one per the
    guarantee's precondition."""
    n_bands = 64 // band_bits
    flips = set(list(flips)[: n_bands - 1])
    other = code
    for bit in flips:
        other ^= 1 << bit
    a, b = _bands(code, 64, band_bits), _bands(other, 64, band_bits)
    assert any(x == y for x, y in zip(a, b))
    # and the Hamming distance really is |flips| (sanity of the model)
    assert bin(code ^ other).count("1") == len(flips)


@settings(max_examples=40, deadline=None)
@given(
    st.sampled_from([32, 64]),
    st.integers(min_value=0, max_value=70),
)
def test_resolve_band_bits_always_guarantees_or_raises(dim, radius):
    """The resolver's postcondition: a returned width ALWAYS satisfies
    the pigeonhole precondition (more bands than the radius), divides
    both dim and the packed word, and is the COARSEST such width; when
    no width can guarantee, it raises instead of silently degrading."""
    from hbase_taggregator_spark.operators.similarity import (
        BINARY_WORD_BITS,
        _resolve_band_bits,
    )

    try:
        bb = _resolve_band_bits(dim, radius, None)
    except ValueError:
        assert radius >= dim  # only unguaranteeable radii may raise
        return
    assert dim % bb == 0 and BINARY_WORD_BITS % bb == 0
    assert dim // bb > radius
    # coarsest: the next-wider candidate must fail the guarantee
    wider = [w for w in (32, 16, 8, 4, 2, 1) if w > bb]
    assert all(dim % w != 0 or dim // w <= radius for w in wider)
