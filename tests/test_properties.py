"""Hypothesis property tests for the pure (no-Spark) kernels: the
winnowing per-position formula vs the SWA definition, suffix-array
cross-span vs DP, OPH engine kernel vs the oracle."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), max_size=40),
       st.integers(min_value=1, max_value=8))
def test_winnow_formula_equals_definition(wh, g):
    """The engine's L+R >= g_eff - 1 selection rule (SQL) must equal the
    slide-every-window/rightmost-min definition for ANY hash sequence,
    including heavy ties (small value range forces them)."""
    from distributed_lsh_spark.operators.substring import oracle_winnow_positions

    n = len(wh)
    geff = min(g, n)
    by_formula = []
    for i in range(1, n + 1):
        L = 0
        for m in range(1, geff):
            if i - m >= 1 and wh[i - 1] <= min(wh[i - m - 1:i - 1]):
                L = m
        R = 0
        for m in range(1, geff):
            if i + m <= n and wh[i - 1] < min(wh[i:i + m]):
                R = m
        if L + R >= geff - 1:
            by_formula.append(i)
    assert by_formula == oracle_winnow_positions(wh, g)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=6), max_size=50),
       st.lists(st.integers(min_value=0, max_value=6), max_size=50))
def test_cross_span_equals_dp(a, b):
    from distributed_lsh_spark.functions.suffix import (
        max_cross_span, oracle_max_span_dp,
    )

    ta = [str(x) for x in a]
    tb = [str(x) for x in b]
    assert max_cross_span(ta, tb) == oracle_max_span_dp(ta, tb)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
                min_size=1, max_size=120, unique=True))
def test_oph_kernel_matches_oracle(shingles):
    from distributed_lsh_spark.conf import DEFAULT_CONFIG
    from distributed_lsh_spark.functions.hashing import minhash_params
    from distributed_lsh_spark.functions.signature import _oph_minhash
    from distributed_lsh_spark.oracle.dedup import oph_sig

    cfg = DEFAULT_CONFIG.with_(minhash_scheme="oph")
    a, b = minhash_params(cfg.num_perm, cfg.seed)
    sh = sorted(shingles)
    dv = np.asarray(sh, dtype=np.int64)
    offsets = np.array([0, len(dv)], dtype=np.int64)
    got = _oph_minhash(dv, offsets, np.uint64(a[0]), np.uint64(b[0]),
                       cfg.num_perm)
    assert got[0].tolist() == oph_sig(sh, cfg)


def test_wav_roundtrip_property():
    """decode_wav inverts the 16-bit PCM encoding for arbitrary signals
    (hypothesis over lengths/frequencies/rates)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from distributed_lsh_spark.functions.multimodal import audio_feature, decode_wav
    from tests.test_extract_checkpoint_misc import _wav_bytes

    @settings(max_examples=25, deadline=None)
    @given(st.integers(16, 4000), st.integers(1, 10_000), st.integers(8000, 48000))
    def inner(n, seed, rate):
        rng = np.random.default_rng(seed)
        sig = rng.uniform(-1, 1, size=n)
        got, got_rate = decode_wav(_wav_bytes(sig, rate=rate))
        assert got_rate == rate
        assert len(got) == n
        assert np.allclose(got, sig, atol=2e-4)
        f = audio_feature(got, rate)
        assert f.shape == (64,) and np.all(f >= 0) and np.all(f <= 1 + 1e-6)

    inner()
