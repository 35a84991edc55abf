"""Sketch correctness + merge associativity (SURVEY.md §7.3 step 3)."""

import math

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sod_ray.state.sketches import (
    Histogram,
    HyperLogLog,
    TDigest,
    Welford,
    hash64,
    ks_statistic,
    psi,
)


def test_welford_exact():
    rng = np.random.default_rng(42)
    x = rng.normal(10, 3, size=10_000)
    w = Welford()
    for chunk in np.array_split(x, 7):
        w.update_array(chunk)
    assert w.n == x.size
    assert w.mean == pytest.approx(x.mean(), rel=1e-12)
    assert w.std == pytest.approx(x.std(ddof=1), rel=1e-10)
    assert w.vmin == x.min() and w.vmax == x.max()


def test_welford_nulls_nans_arrow():
    arr = pa.chunked_array([pa.array([1.0, None, float("nan"), 4.0])])
    w = Welford().update_array(arr)
    assert (w.n, w.n_null, w.n_nan, w.total) == (2, 1, 1, 4)
    assert w.mean == 2.5


def test_welford_merge_matches_single_pass():
    rng = np.random.default_rng(7)
    x = rng.exponential(2.0, size=5000)
    parts = np.array_split(x, 11)
    merged = Welford()
    for p in parts:
        merged.merge(Welford().update_array(p))
    single = Welford().update_array(x)
    assert merged.n == single.n
    assert merged.mean == pytest.approx(single.mean, rel=1e-12)
    assert merged.std == pytest.approx(single.std, rel=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=50),
        min_size=2,
        max_size=6,
    )
)
def test_welford_merge_associative(chunks):
    flat = np.concatenate([np.asarray(c) for c in chunks]) if any(chunks) else np.empty(0)
    left = Welford()
    for c in chunks:
        left.merge(Welford().update_array(np.asarray(c)))
    # right-fold
    right = Welford().update_array(np.asarray(chunks[-1]))
    for c in reversed(chunks[:-1]):
        w = Welford().update_array(np.asarray(c))
        right = w.merge(right)
    assert left.n == right.n == flat.size
    if flat.size:
        assert left.mean == pytest.approx(right.mean, rel=1e-9, abs=1e-9)
        assert left.mean == pytest.approx(flat.mean(), rel=1e-9, abs=1e-9)


def test_hll_accuracy_and_merge():
    n = 20_000
    vals = pa.array([f"url-{i}" for i in range(n)])
    h = HyperLogLog()
    h.update_array(vals)
    assert h.cardinality() == pytest.approx(n, rel=0.03)
    # merge of disjoint halves == union
    h1 = HyperLogLog().update_array(pa.array([f"a-{i}" for i in range(5000)]))
    h2 = HyperLogLog().update_array(pa.array([f"b-{i}" for i in range(5000)]))
    h1.merge(h2)
    assert h1.cardinality() == pytest.approx(10_000, rel=0.05)
    # duplicates don't inflate
    hd = HyperLogLog().update_array(pa.array(["x"] * 1000 + ["y"] * 1000))
    assert hd.cardinality() == pytest.approx(2, abs=1.0)


def test_hash64_stability():
    a = hash64(pa.array(["foo", "bar", None]))
    b = hash64(pa.array(["foo", "bar", None]))
    np.testing.assert_array_equal(a, b)
    assert a[0] != a[1]
    c = hash64(pa.array([1.0, 2.0]))
    assert c[0] != c[1]


def test_tdigest_quantiles():
    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, size=50_000)
    td = TDigest()
    for chunk in np.array_split(x, 17):
        td.update_array(chunk)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert td.quantile(q) == pytest.approx(np.quantile(x, q), abs=0.05)
    assert td.quantile(0.0) == x.min() and td.quantile(1.0) == x.max()


def test_tdigest_merge_close_to_exact():
    rng = np.random.default_rng(3)
    x = rng.lognormal(0, 1, size=30_000)
    parts = np.array_split(x, 9)
    merged = TDigest()
    for p in parts:
        merged.merge(TDigest().update_array(p))
    for q in (0.25, 0.5, 0.75, 0.95):
        assert merged.quantile(q) == pytest.approx(np.quantile(x, q), rel=0.05)


def test_histogram_merge_and_psi():
    rng = np.random.default_rng(0)
    base = Histogram(lo=0.0, hi=10.0, bins=10)
    base.update_array(rng.uniform(0, 10, 10_000))
    same = Histogram(lo=0.0, hi=10.0, bins=10)
    same.update_array(rng.uniform(0, 10, 10_000))
    shifted = Histogram(lo=0.0, hi=10.0, bins=10)
    shifted.update_array(rng.uniform(5, 15, 10_000))
    assert psi(base, same) < 0.02
    assert psi(base, shifted) > 0.5
    # merge = elementwise add
    m = Histogram(lo=0.0, hi=10.0, bins=10).merge(base).merge(same)
    assert m.counts.sum() == 20_000


def test_ks_statistic():
    rng = np.random.default_rng(1)
    a = TDigest().update_array(rng.normal(0, 1, 20_000))
    b = TDigest().update_array(rng.normal(0, 1, 20_000))
    c = TDigest().update_array(rng.normal(2, 1, 20_000))
    assert ks_statistic(a, b) < 0.05
    assert ks_statistic(a, c) > 0.6


def test_serialization_roundtrip():
    w = Welford().update_array(np.arange(100.0))
    w2 = Welford.from_bytes(w.to_bytes())
    assert w2.result() == w.result()
    h = HyperLogLog().update_array(pa.array(["a", "b", "c"]))
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.cardinality() == h.cardinality()
    t = TDigest().update_array(np.arange(1000.0))
    t2 = TDigest.from_bytes(t.to_bytes())
    assert t2.quantile(0.5) == pytest.approx(t.quantile(0.5))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.text(min_size=0, max_size=8), min_size=0, max_size=40),
        min_size=2,
        max_size=5,
    )
)
def test_hll_merge_associative(chunks):
    def fold_left(cs):
        h = HyperLogLog(p=10)
        for c in cs:
            h.merge(HyperLogLog(p=10).update_array(pa.array(c, pa.string())))
        return h.cardinality()

    def fold_right(cs):
        h = HyperLogLog(p=10).update_array(pa.array(cs[-1], pa.string()))
        for c in reversed(cs[:-1]):
            g = HyperLogLog(p=10).update_array(pa.array(c, pa.string()))
            h = g.merge(h)
        return h.cardinality()

    assert fold_left(chunks) == fold_right(chunks)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=60),
        min_size=2,
        max_size=5,
    )
)
def test_tdigest_merge_order_insensitive_bounds(chunks):
    """Merged digest quantiles stay within the global min/max and the
    median lands within the data range regardless of merge order."""
    flat = np.concatenate([np.asarray(c) for c in chunks])
    left = TDigest(delta=100)
    for c in chunks:
        left.merge(TDigest(delta=100).update_array(np.asarray(c)))
    assert flat.min() <= left.quantile(0.5) <= flat.max()
    assert left.quantile(0.0) == flat.min()
    assert left.quantile(1.0) == flat.max()
    assert left.n == flat.size


def test_hash64_large_int_distinct():
    """Integer keys hash via their 64-bit pattern, not float64 (which
    collides beyond 2^53 and crashes past 2^63 — ADVICE r1)."""
    import pyarrow as pa

    from sod_ray.state.sketches import hash64

    big = [2**60, 2**60 + 1, 2**62, 2**62 + 1, -(2**60), -(2**60) - 1]
    h_arrow = hash64(pa.array(big, pa.int64()))
    assert len(set(h_arrow.tolist())) == len(big)
    h_np = hash64(np.array(big, dtype=np.int64))
    assert len(set(h_np.tolist())) == len(big)
    # arrow and numpy paths agree for int64
    np.testing.assert_array_equal(h_arrow, h_np)
    # uint64 beyond int64 range works too
    hu = hash64(pa.array([2**63, 2**63 + 1], pa.uint64()))
    assert hu[0] != hu[1]
    # nulls get a deterministic sentinel distinct from real values
    hn = hash64(pa.array([None, 0], pa.int64()))
    assert hn[0] != hn[1]


def test_hash64_hll_large_ints():
    """HLL distinct counts stay accurate for >2^53 int64 ids."""
    import pyarrow as pa

    from sod_ray.state.sketches import HyperLogLog, hash64

    ids = pa.array([2**60 + i for i in range(5000)], pa.int64())
    h = HyperLogLog()
    h.update_hashes(hash64(ids))
    assert abs(h.cardinality() - 5000) / 5000 < 0.05


def test_hll_sparse_matches_dense():
    # small-cardinality sketches stay sparse and estimate identically
    # to a forced-dense twin under every update/merge mix
    vals = pa.array([f"host-{i}" for i in range(200)])
    sparse = HyperLogLog().update_array(vals)
    dense = HyperLogLog()._densify().update_array(vals)
    assert sparse.registers is None  # still sparse
    assert sparse.cardinality() == dense.cardinality()

    # sparse+sparse merge == dense+dense merge
    other = pa.array([f"other-{i}" for i in range(150)])
    s2 = HyperLogLog().update_array(other)
    d2 = HyperLogLog()._densify().update_array(other)
    assert (
        HyperLogLog().update_array(vals).merge(s2).cardinality()
        == dense.merge(d2).cardinality()
    )

    # mixed-form merges agree both directions
    s3 = HyperLogLog().update_array(vals)
    d3 = HyperLogLog()._densify().update_array(other)
    a = s3.merge(d3).cardinality()
    s4 = HyperLogLog().update_array(other)
    d4 = HyperLogLog()._densify().update_array(vals)
    assert d4.merge(s4).cardinality() == a


def test_hll_sparse_serialized_size():
    # the point of the sparse form: a 10-distinct sketch is a few
    # hundred bytes, not 16 KB
    small = HyperLogLog().update_array(pa.array([f"k{i}" for i in range(10)]))
    assert len(small.to_bytes()) < 1_000
    big = HyperLogLog().update_array(
        pa.array([f"u-{i}" for i in range(100_000)])
    )
    assert big.registers is not None  # densified
    assert big.cardinality() == pytest.approx(100_000, rel=0.03)


def test_hll_densify_threshold_crossing():
    # incremental sparse updates crossing the cutoff densify without
    # losing registers: estimate equals a from-scratch dense sketch
    h = HyperLogLog(p=10)  # cutoff = 204 registers
    chunks = [
        pa.array([f"v-{i}" for i in range(s, s + 60)]) for s in range(0, 600, 60)
    ]
    for c in chunks:
        h.update_array(c)
    assert h.registers is not None
    ref = HyperLogLog(p=10)._densify()
    for c in chunks:
        ref.update_array(c)
    assert h.cardinality() == ref.cardinality()


def test_hll_dense_era_pickle_loads():
    # pickles written before the sparse fields existed must deserialize
    h = HyperLogLog().update_array(pa.array(["a", "b"]))._densify()
    state = dict(h.__dict__)
    state.pop("sparse_idx")
    state.pop("sparse_rank")
    old = HyperLogLog.__new__(HyperLogLog)
    old.__setstate__(state)
    assert old.cardinality() == h.cardinality()
    assert old.merge(HyperLogLog().update_array(pa.array(["c"]))).cardinality() >= 2


def test_compact_codec_bit_identical_and_legacy_pickle():
    """Compact binary codecs: estimates bit-identical across a round
    trip, legacy pickle bytes still load, merge works on decoded
    sketches, and the fine-key sizes actually shrink."""
    import pickle

    from sod_ray.state.sketches import Histogram

    rng = np.random.default_rng(7)
    x = rng.normal(size=10)

    d = TDigest().update_array(x)
    b = d.to_bytes()
    assert b[:1] == b"T" and len(b) < 200  # was ~440 B pickled
    d2 = TDigest.from_bytes(b)
    assert np.array_equal(d2.means, d.means)
    assert np.array_equal(d2.weights, d.weights)
    assert d2.quantile(0.5) == d.quantile(0.5)
    assert (d2.n, d2._vmin, d2._vmax) == (d.n, d._vmin, d._vmax)

    w = Welford().update_array(np.append(x, [np.nan]))
    wb = w.to_bytes()
    assert wb[:1] == b"W" and len(wb) == 65
    assert Welford.from_bytes(wb).result() == w.result()

    h = HyperLogLog().update_array(np.arange(10))
    hb = h.to_bytes()
    assert hb[:1] == b"H" and len(hb) < 100  # was ~330 B pickled
    assert HyperLogLog.from_bytes(hb).cardinality() == h.cardinality()
    hd = HyperLogLog().update_array(np.arange(100_000))
    assert hd.registers is not None
    hdb = hd.to_bytes()
    assert hdb[:1] == b"D"
    assert HyperLogLog.from_bytes(hdb).cardinality() == hd.cardinality()

    g = Histogram(lo=-3.0, hi=3.0).update_array(x)
    g2 = Histogram.from_bytes(g.to_bytes())
    assert np.array_equal(g2.counts, g.counts)
    assert (g2.lo, g2.hi, g2.bins) == (g.lo, g.hi, g.bins)

    # legacy pickles (pre-codec baselines on disk) still load
    for obj, cls in ((d, TDigest), (w, Welford), (h, HyperLogLog), (g, Histogram)):
        legacy = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        back = cls.from_bytes(legacy)
        assert type(back) is cls

    # decoded sketches are mutable and mergeable
    m = TDigest.from_bytes(b).merge(TDigest.from_bytes(b))
    assert m.n == 2 * d.n
    hm = HyperLogLog.from_bytes(hb).merge(HyperLogLog.from_bytes(hdb))
    assert hm.cardinality() >= hd.cardinality() * 0.9

    # weighted centroids (post-compress weights > 1) round-trip too
    big = TDigest().update_array(rng.normal(size=50_000))
    big._compress()
    assert not np.all(big.weights == 1.0)
    bb = big.to_bytes()
    b2 = TDigest.from_bytes(bb)
    assert np.array_equal(b2.weights, big.weights)
    assert b2.quantile(0.9) == big.quantile(0.9)


# ---------------------------------------------------------------------------
# KLL quantile sketch
# ---------------------------------------------------------------------------


def test_kll_small_n_exact():
    from sod_ray.state.sketches import KLL

    sk = KLL(k=200)
    assert math.isnan(sk.quantile(0.5))
    x = np.arange(100, dtype=np.float64)
    sk.update_array(x)
    # under the space budget no compaction happens — quantiles exact-ish
    assert sk.n == 100 and sk.total_weight() == 100
    assert abs(sk.quantile(0.5) - 49.5) <= 1.0
    assert sk.quantile(0.0) == 0.0 and sk.quantile(1.0) == 99.0


def test_kll_rank_accuracy_and_merge():
    from sod_ray.state.sketches import KLL

    rng = np.random.default_rng(11)
    data = rng.lognormal(3.0, 2.0, size=400_000)  # heavy-tailed on purpose
    parts = []
    for i in range(16):
        sk = KLL()
        sk.update_array(data[i::16])
        parts.append(KLL.from_bytes(sk.to_bytes()))
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    # total weight is conserved exactly through every compaction/merge
    assert merged.total_weight() == merged.n == data.size
    sv = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = merged.quantile(q)
        rank = np.searchsorted(sv, est, side="right") / data.size
        # k=200 published ~1.65% @99%; assert half the checked 3% band
        assert abs(rank - q) <= 0.015, (q, rank)
    # serialization round-trip is bit-identical on estimates
    back = KLL.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)
    assert back.total_weight() == merged.total_weight()


def test_kll_merge_order_insensitive_bounds():
    from sod_ray.state.sketches import KLL

    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, size=120_000)
    chunks = np.array_split(data, 8)

    def build(order):
        sk = KLL(k=160)
        for i in order:
            part = KLL(k=160, seed=1000 + i)
            part.update_array(chunks[i])
            sk.merge(part)
        return sk

    a = build(range(8))
    b = build(reversed(range(8)))
    sv = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        for sk in (a, b):
            rank = np.searchsorted(sv, sk.quantile(q), side="right") / data.size
            assert abs(rank - q) <= 0.02
    assert a.total_weight() == b.total_weight() == data.size


def test_kll_nulls_and_cdf():
    from sod_ray.state.sketches import KLL

    arr = pa.array([1.0, None, 2.0, float("nan"), 3.0, 4.0])
    sk = KLL().update_array(arr)
    assert sk.n == 4
    assert sk.cdf(2.5) == pytest.approx(0.5)
    assert sk.cdf(100.0) == 1.0


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters
# ---------------------------------------------------------------------------


def test_misra_gries_deterministic_band():
    import collections

    from sod_ray.state.sketches import MisraGries

    rng = np.random.default_rng(3)
    keys = np.array([f"k{v}" for v in rng.zipf(1.3, size=300_000)])
    parts = []
    for i in range(8):
        mg = MisraGries(m=128)
        mg.update_array(pa.array(keys[i::8]))
        parts.append(MisraGries.from_bytes(mg.to_bytes()))
    mg = parts[0]
    for p in parts[1:]:
        mg.merge(p)
    true = collections.Counter(keys.tolist())
    assert mg.n == keys.size
    # classic bound: accumulated subtraction <= n/(m+1)
    assert mg.err_ub <= keys.size // (128 + 1) + 1
    # deterministic guarantee for every tracked key: est <= true <= est+err
    for k, est in mg.counts.items():
        assert est <= true[k] <= est + mg.err_ub, (k, est, true[k])
    # every key with true count > err_ub is present
    for k, c in true.items():
        if c > mg.err_ub:
            assert k in mg.counts, (k, c, mg.err_ub)
    # top-10 order matches exact top-10 for clear heavy hitters
    exact_top = [k for k, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    sketch_top = [k for k, _ in mg.top(5)]
    assert sketch_top == exact_top


def test_misra_gries_merge_commutative():
    from sod_ray.state.sketches import MisraGries

    a_keys = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(200)]
    b_keys = ["a"] * 40 + ["c"] * 25 + [f"y{i}" for i in range(200)]
    ab = MisraGries(m=64).update_array(pa.array(a_keys)).merge(
        MisraGries(m=64).update_array(pa.array(b_keys))
    )
    ba = MisraGries(m=64).update_array(pa.array(b_keys)).merge(
        MisraGries(m=64).update_array(pa.array(a_keys))
    )
    assert ab.n == ba.n == len(a_keys) + len(b_keys)
    # both orders satisfy the band for the true heavy hitter
    for mg in (ab, ba):
        assert mg.estimate("a") <= 90 <= mg.estimate("a") + mg.err_ub


def test_misra_gries_serde_roundtrip():
    from sod_ray.state.sketches import MisraGries

    mg = MisraGries(m=16)
    mg.update_array(pa.array(["α", "β", "β", "", "with\x00nul"]))
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.counts == mg.counts
    assert (back.m, back.n, back.err_ub) == (mg.m, mg.n, mg.err_ub)


def test_ks_statistic_kll():
    from sod_ray.state.sketches import KLL, ks_statistic_kll

    rng = np.random.default_rng(23)
    base = rng.normal(0, 1, size=200_000)
    same = rng.normal(0, 1, size=200_000)
    shifted = rng.normal(0.5, 1, size=200_000)

    def sk(x, seed):
        s = KLL(seed=seed)
        s.update_array(x)
        return s

    a, b, c = sk(base, 1), sk(same, 2), sk(shifted, 3)
    # same distribution: KS ~ sampling noise + 2x sketch rank error
    assert ks_statistic_kll(a, b) < 0.05
    # mean shift of 0.5 sigma: true KS ~ 0.197 — clearly detected
    assert ks_statistic_kll(a, c) > 0.15
    assert math.isnan(ks_statistic_kll(a, KLL()))


def test_categorical_psi():
    from sod_ray.state.sketches import MisraGries, categorical_psi

    rng = np.random.default_rng(41)
    base_keys = [f"c{v}" for v in rng.zipf(1.5, size=100_000)]
    same_keys = [f"c{v}" for v in rng.zipf(1.5, size=100_000)]
    # shifted: the top category triples its share
    shift_keys = same_keys[:50_000] + ["c1"] * 50_000

    def mg(keys):
        return MisraGries(m=256).update_array(pa.array(keys))

    a, b, c = mg(base_keys), mg(same_keys), mg(shift_keys)
    assert categorical_psi(a, b) < 0.02  # same distribution: quiet
    assert categorical_psi(a, c) > 0.2  # real mix shift: flags


@given(
    st.lists(
        st.lists(st.floats(-1e6, 1e6), min_size=0, max_size=200),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=40, deadline=None)
def test_kll_property_weight_and_band(chunks):
    """Under ANY chunking/merge order: weight conservation holds
    exactly and every estimated quantile's exact rank stays within
    the 3% checked band (tiny n → exact by construction)."""
    from sod_ray.state.sketches import KLL

    flat = (
        np.concatenate([np.asarray(c) for c in chunks])
        if any(len(c) for c in chunks)
        else np.empty(0)
    )
    sk = KLL(k=64)
    for c in chunks:
        part = KLL(k=64)
        part.update_array(np.asarray(c, dtype=np.float64))
        sk.merge(part)
    assert sk.total_weight() == sk.n == flat.size
    if flat.size:
        sv = np.sort(flat)
        for q in (0.25, 0.5, 0.9):
            est = sk.quantile(q)
            lt = np.searchsorted(sv, est, side="left")
            le = np.searchsorted(sv, est, side="right")
            err = max(0.0, lt - q * flat.size, q * flat.size - le)
            # k=64 → eps ~5%; band with the small-n +1 allowance
            assert err <= 0.08 * flat.size + 1.0, (q, err, flat.size)


@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=0, max_size=150),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=40, deadline=None)
def test_misra_gries_property_band(chunks):
    """Under ANY chunking: n is exact, err_ub <= n/(m+1), and every
    tracked estimate obeys est <= true <= est + err_ub."""
    import collections

    from sod_ray.state.sketches import MisraGries

    all_keys = [f"k{v}" for c in chunks for v in c]
    mg = MisraGries(m=8)
    for c in chunks:
        part = MisraGries(m=8)
        if c:
            part.update_array(pa.array([f"k{v}" for v in c]))
        mg.merge(part)
    true = collections.Counter(all_keys)
    assert mg.n == len(all_keys)
    assert mg.err_ub <= len(all_keys) // 9 + 1
    for k, est in mg.counts.items():
        assert est <= true[k] <= est + mg.err_ub


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_band():
    import numpy as np
    import pyarrow as pa

    from sod_ray.state.sketches import BloomFilter

    bf = BloomFilter(m_bits=1 << 16, k=5)
    members = pa.array([f"u{i}" for i in range(2000)])
    bf.add_array(members)
    assert bf.contains_array(members).all()  # the hard guarantee
    absent = pa.array([f"x{i}" for i in range(20000)])
    fp = float(bf.contains_array(absent).mean())
    # analytic: occupancy^k; allow 3x + small floor
    assert fp <= max(0.01, 3.0 * bf.fp_rate())
    # numeric values hash via the splitmix path
    nums = pa.array(np.arange(100, dtype=np.int64))
    bf2 = BloomFilter(m_bits=1 << 12, k=4).add_array(nums)
    assert bf2.contains_array(nums).all()


def test_bloom_merge_equals_bulk_and_codec():
    import pyarrow as pa

    from sod_ray.state.sketches import BloomFilter

    a_vals = pa.array([f"a{i}" for i in range(500)])
    b_vals = pa.array([f"b{i}" for i in range(500)])
    bulk = BloomFilter(1 << 14, 6).add_array(a_vals).add_array(b_vals)
    merged = (
        BloomFilter(1 << 14, 6)
        .add_array(a_vals)
        .merge(BloomFilter(1 << 14, 6).add_array(b_vals))
    )
    assert (bulk.words == merged.words).all()
    rt = BloomFilter.from_bytes(merged.to_bytes())
    assert (rt.words == merged.words).all()
    assert (rt.m_bits, rt.k) == (merged.m_bits, merged.k)
    # merge is idempotent (safe under task retries)
    again = merged.merge(BloomFilter(1 << 14, 6).add_array(a_vals))
    assert (again.words == bulk.words).all()
    import pytest

    with pytest.raises(ValueError):
        merged.merge(BloomFilter(1 << 15, 6))


def test_bloom_build_column_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sod_ray.stages.stats import bloom_build_column, bloom_probe_column
    from sod_ray.state.sketches import BloomFilter

    ids = np.arange(5000, dtype=np.int64) * 7
    ds = rd.from_pandas(pd.DataFrame({"uid": ids})).repartition(8)
    bloom = bloom_build_column(ds, "uid", m_bits=1 << 16, k=5)
    serial = BloomFilter(1 << 16, 5).add_array(pa.array(ids))
    assert (bloom.words == serial.words).all()
    probed = bloom_probe_column(ds, "uid", bloom).to_pandas()
    assert probed["bloom_hit"].all()


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_countmin_guarantees_and_merge():
    import numpy as np
    import pyarrow as pa

    from sod_ray.state.sketches import CountMin

    rng = np.random.default_rng(17)
    # zipf-ish stream with known exact counts
    items = np.repeat(
        [f"t{i}" for i in range(500)],
        (2000 / (np.arange(500) + 1)).astype(int) + 1,
    )
    rng.shuffle(items)
    cm = CountMin(width=1 << 12, depth=4)
    cm.add_array(pa.array(items))
    probe = [f"t{i}" for i in range(20)] + ["absent1", "absent2"]
    est = cm.estimate_array(pa.array(probe))
    import collections

    exact = collections.Counter(items.tolist())
    ex = np.array([exact.get(p, 0) for p in probe], np.int64)
    assert (est >= ex).all()  # the one-sided guarantee, always
    assert (est - ex <= cm.error_bound(slack=8.0)).all()
    # chunked adds + merge == bulk add, element-exact
    bulk = CountMin(1 << 12, 4).add_array(pa.array(items))
    half = len(items) // 2
    m = (
        CountMin(1 << 12, 4)
        .add_array(pa.array(items[:half]))
        .merge(CountMin(1 << 12, 4).add_array(pa.array(items[half:])))
    )
    assert (bulk.counts == m.counts).all() and bulk.n == m.n
    # weighted adds == repeated adds
    wtd = CountMin(1 << 12, 4).add_array(
        pa.array(["x", "y"]), weights=np.array([5, 3])
    )
    rep = CountMin(1 << 12, 4).add_array(pa.array(["x"] * 5 + ["y"] * 3))
    assert (wtd.counts == rep.counts).all()
    # codec round-trip
    rt = CountMin.from_bytes(bulk.to_bytes())
    assert (rt.counts == bulk.counts).all() and rt.n == bulk.n
    import pytest

    with pytest.raises(ValueError):
        bulk.merge(CountMin(1 << 11, 4))


def test_cm_build_tokens_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from sod_ray.stages.stats import cm_build_tokens
    from sod_ray.state.sketches import CountMin

    texts = [f"alpha beta w{i} alpha" for i in range(2000)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(8)
    cm = cm_build_tokens(ds, "text", width=1 << 12, depth=4)
    toks = [w for t in texts for w in t.split()]
    serial = CountMin(1 << 12, 4).add_array(pa.array(toks))
    assert (cm.counts == serial.counts).all() and cm.n == serial.n
    est = cm.estimate_array(pa.array(["alpha", "beta"]))
    assert est[0] >= 4000 and est[1] >= 2000


def test_sharded_bloom_parity_and_merge():
    """ShardedBloom: no false negatives, fp in band, 1-shard
    degenerates bit-identically to the flat BloomFilter, incremental
    merge == bulk build, codec round-trips, dirty tracking."""
    import numpy as np
    import pyarrow as pa

    from sod_ray.state.sketches import BloomFilter, ShardedBloom

    vals = pa.array([f"url-{i}" for i in range(30000)])
    miss = pa.array([f"other-{i}" for i in range(30000)])

    sb = ShardedBloom(n_shards=8, m_bits_per_shard=1 << 17, k=7)
    sb.add_array(vals)
    assert sb.contains_array(vals).all()  # NO false negatives, ever
    assert sb.contains_array(miss).mean() < 0.01
    assert 0 <= sb.fp_rate() <= sb.fp_rate_max() < 0.01

    # 1-shard == flat BloomFilter, bit for bit
    one = ShardedBloom(1, 1 << 20, 7).add_array(vals)
    flat = BloomFilter(1 << 20, 7).add_array(vals)
    assert (one.shards[0].words == flat.words).all()

    # split merge == bulk build (idempotent OR: merging twice too)
    a = ShardedBloom(8, 1 << 17).add_array(vals.slice(0, 15000))
    b = ShardedBloom(8, 1 << 17).add_array(vals.slice(15000))
    a.merge(b).merge(b)
    assert a.to_bytes() == sb.to_bytes()

    # codec round-trip
    rt = ShardedBloom.from_bytes(sb.to_bytes())
    assert rt.n_shards == 8 and rt.to_bytes() == sb.to_bytes()
    assert not rt.dirty  # fresh load is clean

    # dirty tracking: one value touches exactly one shard
    rt.add_array(pa.array(["only-one"]))
    assert len(rt.dirty) == 1

    # routing uses the top hash bits; every shard gets real load
    from sod_ray.state.sketches import hash64

    sid = sb.route(hash64(vals))
    assert set(np.unique(sid)) == set(range(8))

    # hash-level API matches the value-level API
    h = hash64(vals)
    assert (sb.contains_hashes(h) == sb.contains_array(vals)).all()
