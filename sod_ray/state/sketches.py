"""Mergeable streaming sketches — the distributed generalization of the
reference's per-vector aggregate library (SURVEY.md §2.3/§2.5 G7).

Every sketch supports the Ray Data partial+final aggregation contract:

    sk = Sketch(...); sk.update_array(batch_column)   # accumulate (per batch)
    sk.merge(other)                                    # merge (groupby shuffle)
    sk.finalize()/.result()                            # finalize

Merges are associative and commutative (property-tested), so salted
two-level merges for skewed partitions are safe. All sketches serialize
via ``to_bytes``/``from_bytes`` (pickle of plain numpy/dict state) so a
``groupby().aggregate`` or map_groups stage can carry them in Arrow
binary columns and the manifest can persist them for drift baselines.

- Welford: mean/M2 variance, plus min/max/count/null/NaN — the exact
  merge formula of Chan et al. (parallel variance).
- HyperLogLog: 2^p registers, sparse pair-list below ~20% occupancy
  (fine-partition-key sketches stay ~100s of bytes, not 16 KB),
  64-bit hashing stable across processes — never Python hash().
- TDigest: simplified merging t-digest (Dunning & Ertl) for quantiles.
- Histogram: fixed bins over a reference range — the PSI drift input.
"""

from __future__ import annotations

import math
import pickle
import struct
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


class _Serializable:
    """Serialization with a compact binary codec per sketch class.

    The first byte is a format tag; pickle streams start with 0x80, so
    bytes written by earlier versions (plain pickle) stay readable.
    The compact forms preserve float64 payloads exactly — estimates are
    bit-identical across a round-trip — and cut the per-sketch overhead
    that dominates at fine partition keys (a 10-value t-digest is 118 B
    compact vs 440 B pickled; a 10-register sparse HLL 56 B vs 332 B).
    At 10^7 keys × a few columns that is the difference between the
    sketch-merge shuffle moving ~2 GB and ~13 GB."""

    _TAG: bytes = b""  # override per class

    def to_bytes(self) -> bytes:
        return self._to_compact()

    def _to_compact(self) -> bytes:  # pragma: no cover - overridden
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_bytes(cls, b: bytes):
        if b[:1] == b"\x80":  # legacy pickle (older baselines on disk)
            obj = pickle.loads(b)
            if not isinstance(obj, cls):
                raise TypeError(
                    f"expected {cls.__name__}, got {type(obj).__name__}"
                )
            return obj
        return cls._from_compact(b)

    @classmethod
    def _from_compact(cls, b: bytes):  # pragma: no cover - overridden
        raise TypeError(f"{cls.__name__}: unknown serialized format")


# ---------------------------------------------------------------------------
# Welford column stats
# ---------------------------------------------------------------------------


@dataclass
class Welford(_Serializable):
    """Streaming count/mean/variance/min/max/null/NaN for one column.

    Distributed form of the reference's Point Sum/Mean/Min/Max library
    (/root/reference/internal/geom/point.go:82-128) with the correct
    all-negative max semantics (reference bug documented in
    sod_ray.functions.point.vmax)."""

    n: int = 0  # non-null, non-NaN values
    mean: float = 0.0
    m2: float = 0.0
    vmin: float = math.inf
    vmax: float = -math.inf
    n_null: int = 0
    n_nan: int = 0
    total: int = 0  # all rows seen incl. null/NaN

    _FMT = "<cqddddqqq"  # tag + the 8 fields above; 65 B fixed

    def _to_compact(self) -> bytes:
        return struct.pack(
            self._FMT, b"W", self.n, self.mean, self.m2, self.vmin,
            self.vmax, self.n_null, self.n_nan, self.total,
        )

    @classmethod
    def _from_compact(cls, b: bytes) -> "Welford":
        tag, n, mean, m2, vmin, vmax, n_null, n_nan, total = struct.unpack(
            cls._FMT, b
        )
        if tag != b"W":
            raise TypeError(f"Welford: bad tag {tag!r}")
        return cls(
            n=n, mean=mean, m2=m2, vmin=vmin, vmax=vmax,
            n_null=n_null, n_nan=n_nan, total=total,
        )

    def update_array(self, arr) -> "Welford":
        """Accumulate a pyarrow Array/ChunkedArray or numpy array —
        vectorized (one pass of numpy reductions per batch)."""
        if isinstance(arr, pa.ChunkedArray):
            for chunk in arr.chunks:
                self.update_array(chunk)
            return self
        if isinstance(arr, pa.Array):
            self.total += len(arr)
            self.n_null += arr.null_count
            x = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            x = np.asarray(arr, dtype=np.float64)
            self.total += x.shape[0]
        nan_mask = np.isnan(x)
        n_nan = int(nan_mask.sum())
        if n_nan:
            self.n_nan += n_nan
            x = x[~nan_mask]
        k = x.shape[0]
        if k == 0:
            return self
        b_mean = float(x.mean())
        b_m2 = float(((x - b_mean) ** 2).sum())
        self._combine(k, b_mean, b_m2, float(x.min()), float(x.max()))
        return self

    def _combine(self, n2: int, mean2: float, m2_2: float, mn: float, mx: float):
        n1 = self.n
        n = n1 + n2
        delta = mean2 - self.mean
        self.mean = self.mean + delta * n2 / n if n else 0.0
        self.m2 = self.m2 + m2_2 + delta * delta * n1 * n2 / n if n else 0.0
        self.n = n
        self.vmin = min(self.vmin, mn)
        self.vmax = max(self.vmax, mx)

    def merge(self, other: "Welford") -> "Welford":
        if other.n:
            self._combine(other.n, other.mean, other.m2, other.vmin, other.vmax)
        self.n_null += other.n_null
        self.n_nan += other.n_nan
        self.total += other.total
        return self

    @property
    def variance(self) -> float:
        """Sample variance (ddof=1)."""
        return self.m2 / (self.n - 1) if self.n > 1 else float("nan")

    @property
    def std(self) -> float:
        v = self.variance
        return math.sqrt(v) if v == v else float("nan")

    def result(self) -> dict:
        return {
            "count": self.n,
            "mean": self.mean if self.n else float("nan"),
            "std": self.std,
            "min": self.vmin if self.n else float("nan"),
            "max": self.vmax if self.n else float("nan"),
            "null_count": self.n_null,
            "nan_count": self.n_nan,
            "total": self.total,
        }


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a high-quality 64-bit mixer."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash64(values) -> np.ndarray:
    """Vectorized 64-bit hashes of a string/binary/numeric array.

    Strings/binary hash via polars (vectorized aHash — stable within a
    process/container, which is all the engine persists across);
    numerics via splitmix64 of the float64 bit pattern (stable
    everywhere). Never Python's salted hash(). Used for HLL, dedup
    keys, bucketed joins and salting."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if (
            pa.types.is_string(values.type)
            or pa.types.is_large_string(values.type)
            or pa.types.is_binary(values.type)
            or pa.types.is_large_binary(values.type)
        ):
            import polars as pl

            s = pl.Series(values)
            h = s.hash(seed=0).to_numpy().astype(np.uint64)
            if values.null_count:
                # distinguish null deterministically
                h = np.where(
                    np.asarray(s.is_null()), np.uint64(0x6E756C6C6E756C6C), h
                )
            return _splitmix64(h)
        if pa.types.is_integer(values.type) or pa.types.is_boolean(values.type):
            # Hash integers via their native 64-bit pattern — a float64
            # cast loses precision beyond 2^53 (silent collisions) and
            # raises ArrowInvalid past 2^63.
            target = (
                pa.uint64()
                if pa.types.is_unsigned_integer(values.type)
                else pa.int64()
            )
            filled = values.cast(target)
            nullmask = (
                np.asarray(filled.is_null()) if filled.null_count else None
            )
            np_vals = filled.fill_null(0).to_numpy(zero_copy_only=False)
            h = _splitmix64(np_vals.view(np.uint64))
            if nullmask is not None:
                h = h.copy()
                h[nullmask] = _splitmix64(
                    np.array([0x6E756C6C6E756C6C], np.uint64)
                )[0]
            return h
        np_vals = values.cast(pa.float64()).fill_null(float("-1.5e308")).to_numpy(
            zero_copy_only=False
        )
        return _splitmix64(np_vals.view(np.uint64))
    arr = np.asarray(values)
    if arr.dtype.kind == "i":
        return _splitmix64(arr.astype(np.int64).view(np.uint64))
    if arr.dtype.kind == "u":
        return _splitmix64(arr.astype(np.uint64))
    if arr.dtype.kind == "f":
        return _splitmix64(arr.astype(np.float64).view(np.uint64))
    import polars as pl

    return _splitmix64(pl.Series(arr.astype(str)).hash(seed=0).to_numpy().astype(np.uint64))


@dataclass
class HyperLogLog(_Serializable):
    """HLL with 2^p registers (p=14 default → ~0.8% error).

    Representation is adaptive: a sketch starts as a SPARSE list of
    (register index, rank) pairs — ~5 B per touched register — and
    densifies to the uint8[2^p] array only once the pair list would
    rival the dense size. Per-(partition-key, column) sketches at
    fine keys (e.g. ~10^7 hosts, most holding a handful of rows)
    stay a few hundred bytes instead of 16 KB each, so the sketch
    merge shuffle scales with data volume, not key count × 16 KB.
    Estimates are identical in both forms (an untouched register is
    an implicit zero); merges may mix forms freely."""

    p: int = 14
    registers: np.ndarray = field(default=None)  # uint8[2^p]; None = sparse
    sparse_idx: np.ndarray = field(default=None)  # int32[], sorted unique
    sparse_rank: np.ndarray = field(default=None)  # uint8[], aligned

    def __post_init__(self):
        if self.registers is None and self.sparse_idx is None:
            self.sparse_idx = np.empty(0, dtype=np.int32)
            self.sparse_rank = np.empty(0, dtype=np.uint8)

    def __setstate__(self, state):
        # pickles from the dense-only era lack the sparse fields
        self.__dict__.update(state)
        self.__dict__.setdefault("sparse_idx", None)
        self.__dict__.setdefault("sparse_rank", None)

    def _to_compact(self) -> bytes:
        if self.registers is None:  # sparse: tag 'H' + p + k + pairs
            idx = np.ascontiguousarray(self.sparse_idx, dtype=np.int32)
            rank = np.ascontiguousarray(self.sparse_rank, dtype=np.uint8)
            return (
                struct.pack("<cBi", b"H", self.p, idx.size)
                + idx.tobytes()
                + rank.tobytes()
            )
        regs = np.ascontiguousarray(self.registers, dtype=np.uint8)
        return struct.pack("<cB", b"D", self.p) + regs.tobytes()

    @classmethod
    def _from_compact(cls, b: bytes) -> "HyperLogLog":
        if b[:1] == b"H":
            _, p, k = struct.unpack("<cBi", b[:6])
            idx = np.frombuffer(b, dtype=np.int32, count=k, offset=6).copy()
            rank = np.frombuffer(
                b, dtype=np.uint8, count=k, offset=6 + 4 * k
            ).copy()
            return cls(p=p, sparse_idx=idx, sparse_rank=rank)
        if b[:1] == b"D":
            _, p = struct.unpack("<cB", b[:2])
            regs = np.frombuffer(b, dtype=np.uint8, count=1 << p, offset=2).copy()
            return cls(p=p, registers=regs)
        raise TypeError(f"HyperLogLog: bad tag {b[:1]!r}")

    def _dense_cutoff(self) -> int:
        # past this many touched registers the pair list (~5 B each)
        # stops being smaller than the 1-B/register dense array
        return (1 << self.p) // 5

    def _densify(self) -> "HyperLogLog":
        if self.registers is None:
            regs = np.zeros(1 << self.p, dtype=np.uint8)
            if self.sparse_idx is not None and self.sparse_idx.size:
                regs[self.sparse_idx] = self.sparse_rank
            self.registers = regs
            self.sparse_idx = None
            self.sparse_rank = None
        return self

    def _sparse_accumulate(self, idx: np.ndarray, rank: np.ndarray):
        """Fold (idx, rank) pairs (duplicates allowed) into the sorted
        unique pair list, keeping the max rank per register."""
        cat_idx = np.concatenate([self.sparse_idx, idx.astype(np.int32)])
        cat_rank = np.concatenate([self.sparse_rank, rank.astype(np.uint8)])
        order = np.lexsort((cat_rank, cat_idx))
        cat_idx, cat_rank = cat_idx[order], cat_rank[order]
        last = np.concatenate([cat_idx[1:] != cat_idx[:-1], [True]])
        self.sparse_idx = cat_idx[last]
        self.sparse_rank = cat_rank[last]
        if self.sparse_idx.size > self._dense_cutoff():
            self._densify()

    def _idx_rank(self, h: np.ndarray):
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = leading zeros of w + 1, over the top (64-p) bits
        lz = np.zeros(h.shape, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        w_work = w.copy()
        alive = np.ones(h.shape, dtype=bool)
        for _ in range(64 - self.p + 1):
            top_zero = alive & ((w_work & mask) == 0)
            lz[top_zero] += 1
            alive &= top_zero
            if not alive.any():
                break
            w_work = w_work << np.uint64(1)
        return idx, lz + 1

    def update_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Vectorized register update from 64-bit hashes."""
        if h.size == 0:
            return self
        if (
            self.registers is None
            and h.size + self.sparse_idx.size > self._dense_cutoff()
        ):
            # big batch: maximum.at on the dense array is cheaper than
            # a pair-list sort, and the result would likely densify
            # anyway — global column sketches take this path on their
            # first batch, keeping the hot fused-scan cost unchanged
            self._densify()
        idx, rank = self._idx_rank(h)
        if self.registers is not None:
            np.maximum.at(self.registers, idx, rank)
        else:
            self._sparse_accumulate(idx, rank)
        return self

    def update_array(self, arr) -> "HyperLogLog":
        return self.update_hashes(hash64(arr))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("HLL precision mismatch")
        other_sparse_idx = getattr(other, "sparse_idx", None)
        if self.registers is not None:
            if other.registers is not None:
                np.maximum(self.registers, other.registers, out=self.registers)
            elif other_sparse_idx is not None and other_sparse_idx.size:
                np.maximum.at(self.registers, other_sparse_idx, other.sparse_rank)
            return self
        if other.registers is not None:
            self._densify()
            np.maximum(self.registers, other.registers, out=self.registers)
            return self
        if other_sparse_idx is not None and other_sparse_idx.size:
            self._sparse_accumulate(other_sparse_idx, other.sparse_rank)
        return self

    def cardinality(self) -> float:
        m = float(1 << self.p)
        if self.registers is not None:
            regs = self.registers.astype(np.float64)
            sum_exp = float(np.sum(np.exp2(-regs)))
            zeros = int(np.count_nonzero(self.registers == 0))
        else:
            nnz = self.sparse_idx.size
            sum_exp = (m - nnz) + float(
                np.sum(np.exp2(-self.sparse_rank.astype(np.float64)))
            )
            zeros = int(m) - nnz
        est = (0.7213 / (1 + 1.079 / m)) * m * m / sum_exp
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)  # linear counting
        return float(est)

    def result(self) -> dict:
        return {"estimate": self.cardinality()}


# ---------------------------------------------------------------------------
# t-digest (merging digest, simplified)
# ---------------------------------------------------------------------------


@dataclass
class TDigest(_Serializable):
    """Merging t-digest (Dunning & Ertl, k1 scale) for quantiles.

    Accumulates values into a buffer; compresses into weighted
    centroids when the buffer fills or on merge/quantile. Merge =
    concatenate centroids + recompress (associative up to the usual
    t-digest approximation; property-tested against exact quantiles)."""

    delta: float = 200.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0))
    weights: np.ndarray = field(default_factory=lambda: np.empty(0))
    _buf: list = field(default_factory=list)
    n: int = 0
    _vmin: float = math.inf
    _vmax: float = -math.inf

    def to_bytes(self) -> bytes:
        self._compress()  # never serialize the raw value buffer
        return super().to_bytes()

    _HDR = "<cdqddiB"  # tag, delta, n, vmin, vmax, k, flags

    def _to_compact(self) -> bytes:
        # flag bit 0: every centroid has weight 1.0 (the common case for
        # fine partition keys) — weights omitted entirely
        m = np.ascontiguousarray(self.means, dtype=np.float64)
        w = np.ascontiguousarray(self.weights, dtype=np.float64)
        all_one = bool(m.size == 0 or np.all(w == 1.0))
        hdr = struct.pack(
            self._HDR, b"T", self.delta, self.n, self._vmin, self._vmax,
            m.size, 1 if all_one else 0,
        )
        return hdr + m.tobytes() + (b"" if all_one else w.tobytes())

    @classmethod
    def _from_compact(cls, b: bytes) -> "TDigest":
        hsz = struct.calcsize(cls._HDR)
        tag, delta, n, vmin, vmax, k, flags = struct.unpack(cls._HDR, b[:hsz])
        if tag != b"T":
            raise TypeError(f"TDigest: bad tag {tag!r}")
        means = np.frombuffer(b, dtype=np.float64, count=k, offset=hsz).copy()
        if flags & 1:
            weights = np.ones(k, dtype=np.float64)
        else:
            weights = np.frombuffer(
                b, dtype=np.float64, count=k, offset=hsz + 8 * k
            ).copy()
        d = cls(delta=delta, means=means, weights=weights, n=n)
        d._vmin, d._vmax = vmin, vmax
        return d

    def update_array(self, arr) -> "TDigest":
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = arr.drop_null().to_numpy(zero_copy_only=False)
        x = np.asarray(arr, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        self._buf.append(x)
        self.n += x.size
        self._vmin = min(self._vmin, float(x.min()))
        self._vmax = max(self._vmax, float(x.max()))
        if sum(b.size for b in self._buf) > 10 * self.delta:
            self._compress()
        return self

    def _compress(self):
        if self._buf:
            bm = np.concatenate(self._buf)
            bw = np.ones(bm.size)
            self._buf = []
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, bw])
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # k1 scale function: k(q) = delta/(2*pi) * asin(2q-1)
        out_m, out_w = [], []
        cum = 0.0
        cur_m, cur_w = means[0], weights[0]

        def k_fn(q):
            return self.delta / (2 * math.pi) * math.asin(max(-1.0, min(1.0, 2 * q - 1)))

        k_lo = k_fn(0.0)
        for m_i, w_i in zip(means[1:], weights[1:]):
            q_hi = (cum + cur_w + w_i) / total
            if k_fn(q_hi) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + m_i * w_i) / (cur_w + w_i)
                cur_w += w_i
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = k_fn(cum / total)
                cur_m, cur_w = m_i, w_i
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        other_copy_means = other.means
        other_copy_weights = other.weights
        if other._buf:
            self._buf.extend(other._buf)
        self.means = np.concatenate([self.means, other_copy_means])
        self.weights = np.concatenate([self.weights, other_copy_weights])
        self.n += other.n
        self._vmin = min(self._vmin, other._vmin)
        self._vmax = max(self._vmax, other._vmax)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if q <= 0:
            return self._vmin
        if q >= 1:
            return self._vmax
        w = self.weights
        cum = np.cumsum(w) - w / 2.0
        target = q * w.sum()
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(q) for q in qs])

    def result(self) -> dict:
        return {
            "p50": self.quantile(0.5),
            "p90": self.quantile(0.9),
            "p99": self.quantile(0.99),
            "n": self.n,
        }


# ---------------------------------------------------------------------------
# KLL quantile sketch
# ---------------------------------------------------------------------------


@dataclass
class KLL(_Serializable):
    """KLL quantile sketch (Karnin, Lang & Liberty 2016; the PAPERS.md
    KLL± line) — the second quantile backend next to :class:`TDigest`
    (the north-star text names both). Level ``h`` holds items of
    weight ``2^h``; level capacities shrink geometrically
    (``k·(2/3)^(depth-1-h)``, floor 2) so total space is O(k).
    Compaction sorts a level and promotes a random-offset half to the
    level above — total weight is conserved exactly (property-tested:
    Σ len(level)·2^h == n always), so ranks are unbiased.

    Published accuracy: normalized rank error ≈ 1.65% at 99%
    confidence for k=200 (Apache DataSketches' calibration of the same
    algorithm); the in-band oracle twin (`kll_quantiles_checked`)
    asserts a 3% band. Unlike the t-digest (value-interpolating,
    accuracy degrades in heavy tails), KLL's guarantee is on RANK —
    uniform over the distribution — which is the right contract for
    per-partition quantile merges over arbitrarily skewed web-scale
    columns.

    Merge = concatenate levels pairwise + recompact: associative and
    commutative in distribution, error bound preserved (the mergeable-
    summaries property the partial+final shuffle relies on)."""

    k: int = 200
    levels: list = field(default_factory=list)  # list[np.float64 arrays]
    n: int = 0
    _vmin: float = math.inf
    _vmax: float = -math.inf
    seed: int = 0xD1CE5EED

    def _cap(self, h: int, depth: int) -> int:
        # capacity of level h counted with the TOP level at k
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - h))))

    def _budget(self, depth: int) -> int:
        return sum(self._cap(h, depth) for h in range(depth))

    def _rng(self, h: int):
        # deterministic per (seed, n, level) — reproducible single-run
        # behavior without any global RNG state
        mix = _splitmix64(
            np.array([self.seed ^ (self.n << 8) ^ h], dtype=np.uint64)
        )[0]
        return np.random.default_rng(int(mix))

    def _compact_level(self, h: int):
        arr = np.sort(self.levels[h])
        rng = self._rng(h)
        if arr.size % 2:
            # odd count: one item stays at this level (weight conserved);
            # a random END stays so pairing remains unbiased
            if rng.integers(2):
                keep, arr = arr[:1], arr[1:]
            else:
                keep, arr = arr[-1:], arr[:-1]
        else:
            keep = arr[:0]
        promoted = arr[int(rng.integers(2))::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def _maybe_compact(self):
        while True:
            depth = len(self.levels)
            total = sum(a.size for a in self.levels)
            if total <= self._budget(depth):
                return
            for h in range(depth):
                if self.levels[h].size > self._cap(h, depth):
                    self._compact_level(h)
                    break
            else:
                return

    def update_array(self, arr) -> "KLL":
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = arr.drop_null().to_numpy(zero_copy_only=False)
        x = np.asarray(arr, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        if not self.levels:
            self.levels.append(np.empty(0, dtype=np.float64))
        self._vmin = min(self._vmin, float(x.min()))
        self._vmax = max(self._vmax, float(x.max()))
        # fold large batches in budget-sized slices so level 0 never
        # balloons past the O(k) contract mid-batch
        step = max(self._budget(max(1, len(self.levels))), 2 * self.k)
        for lo in range(0, x.size, step):
            piece = x[lo : lo + step]
            self.levels[0] = np.concatenate([self.levels[0], piece])
            self.n += piece.size
            self._maybe_compact()
        return self

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("KLL k mismatch")
        if not other.levels:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, arr in enumerate(other.levels):
            if arr.size:
                self.levels[h] = np.concatenate([self.levels[h], arr])
        self.n += other.n
        self._vmin = min(self._vmin, other._vmin)
        self._vmax = max(self._vmax, other._vmax)
        self._maybe_compact()
        return self

    def _items(self):
        """(sorted values, aligned weights) across all levels."""
        vals = [a for a in self.levels if a.size]
        wts = [
            np.full(a.size, float(1 << h))
            for h, a in enumerate(self.levels)
            if a.size
        ]
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._items()
        if v.size == 0:
            return float("nan")
        if q <= 0:
            return self._vmin
        if q >= 1:
            return self._vmax
        cum = np.cumsum(w) - w / 2.0
        return float(np.interp(q * w.sum(), cum, v))

    def quantiles(self, qs) -> np.ndarray:
        return np.asarray([self.quantile(q) for q in qs])

    def cdf(self, x: float) -> float:
        """Estimated fraction of values ≤ x."""
        v, w = self._items()
        if v.size == 0:
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    def total_weight(self) -> int:
        return int(sum(a.size * (1 << h) for h, a in enumerate(self.levels)))

    _HDR = "<cqqddqB"  # tag, k, n, vmin, vmax, seed, depth

    def _to_compact(self) -> bytes:
        parts = [
            struct.pack(
                self._HDR, b"K", self.k, self.n, self._vmin, self._vmax,
                self.seed, len(self.levels),
            )
        ]
        for a in self.levels:
            a = np.ascontiguousarray(a, dtype=np.float64)
            parts.append(struct.pack("<i", a.size) + a.tobytes())
        return b"".join(parts)

    @classmethod
    def _from_compact(cls, b: bytes) -> "KLL":
        hsz = struct.calcsize(cls._HDR)
        tag, k, n, vmin, vmax, seed, depth = struct.unpack(cls._HDR, b[:hsz])
        if tag != b"K":
            raise TypeError(f"KLL: bad tag {tag!r}")
        off = hsz
        levels = []
        for _ in range(depth):
            (sz,) = struct.unpack("<i", b[off : off + 4])
            off += 4
            levels.append(
                np.frombuffer(b, dtype=np.float64, count=sz, offset=off).copy()
            )
            off += 8 * sz
        sk = cls(k=k, levels=levels, n=n, seed=seed)
        sk._vmin, sk._vmax = vmin, vmax
        return sk

    def result(self) -> dict:
        return {
            "p50": self.quantile(0.5),
            "p90": self.quantile(0.9),
            "p99": self.quantile(0.99),
            "n": self.n,
        }


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters
# ---------------------------------------------------------------------------


@dataclass
class MisraGries(_Serializable):
    """Mergeable Misra–Gries heavy-hitters summary (Agarwal, Cormode
    et al., "Mergeable Summaries", PODS'12 reduction): at most ``m``
    tracked keys; when the key set overflows, the (m+1)-th largest
    count is subtracted from every key and non-positive keys drop.

    DETERMINISTIC guarantee (not probabilistic): estimates only
    UNDERCOUNT, and ``true − est ≤ err_ub`` where ``err_ub`` is the
    exact accumulated subtraction (tracked, not bounded after the
    fact); the classic analysis also gives ``err_ub ≤ n/(m+1)``. Any
    key with true count > err_ub is guaranteed present. This makes a
    one-pass, no-shuffle top-k over 10^12 rows checkable in-band: the
    oracle twin asserts ``est ≤ exact ≤ est + err_ub`` per heavy key.

    Batch updates fold vectorized value-counts (pyarrow
    ``value_counts`` — no Python loop over rows, only over the ≤
    (m + batch-distinct) tracked keys); merge = add counts keywise,
    then one overflow reduction. Associative and commutative in the
    (est, err_ub) contract."""

    m: int = 512
    counts: dict = field(default_factory=dict)  # key(str) -> int
    n: int = 0
    err_ub: int = 0  # total subtracted so far — the exact error bound

    def _reduce(self):
        if len(self.counts) <= self.m:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        # (m+1)-th largest value — subtracting it leaves ≤ m positives
        thr = int(np.partition(vals, len(vals) - (self.m + 1))[
            len(vals) - (self.m + 1)
        ])
        if thr <= 0:
            return
        self.counts = {
            k: c - thr for k, c in self.counts.items() if c > thr
        }
        self.err_ub += thr

    def update_value_counts(self, keys, cnts) -> "MisraGries":
        """Fold (key, count) pairs — the per-batch aggregation form."""
        d = self.counts
        for k, c in zip(keys, cnts):
            c = int(c)
            self.n += c
            if k in d:
                d[k] += c
            else:
                d[k] = c
        self._reduce()
        return self

    def update_array(self, arr) -> "MisraGries":
        import pyarrow.compute as pc

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, pa.Array):
            arr = arr.drop_null()
            vc = pc.value_counts(arr)
            return self.update_value_counts(
                vc.field("values").to_pylist(),
                vc.field("counts").to_numpy(zero_copy_only=False),
            )
        vals, cnts = np.unique(np.asarray(arr), return_counts=True)
        return self.update_value_counts(
            [str(v) for v in vals], cnts
        )

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.m != self.m:
            raise ValueError("MisraGries capacity mismatch")
        d = self.counts
        for k, c in other.counts.items():
            d[k] = d.get(k, 0) + c
        self.n += other.n
        self.err_ub += other.err_ub
        self._reduce()
        return self

    def top(self, k: int) -> list:
        """[(key, est_count)] for the k largest estimates, count-desc
        then key-asc (deterministic)."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[:k]

    def estimate(self, key) -> int:
        return self.counts.get(key, 0)

    _HDR = "<cqqqi"  # tag, m, n, err_ub, n_keys

    def _to_compact(self) -> bytes:
        keys = list(self.counts.keys())
        cnts = np.fromiter(
            (self.counts[k] for k in keys), dtype=np.int64, count=len(keys)
        )
        kb = [k.encode() if isinstance(k, str) else bytes(k) for k in keys]
        lens = np.fromiter((len(b) for b in kb), dtype=np.int32, count=len(kb))
        return (
            struct.pack(self._HDR, b"M", self.m, self.n, self.err_ub, len(kb))
            + cnts.tobytes()
            + lens.tobytes()
            + b"".join(kb)
        )

    @classmethod
    def _from_compact(cls, b: bytes) -> "MisraGries":
        hsz = struct.calcsize(cls._HDR)
        tag, m, n, err_ub, nk = struct.unpack(cls._HDR, b[:hsz])
        if tag != b"M":
            raise TypeError(f"MisraGries: bad tag {tag!r}")
        off = hsz
        cnts = np.frombuffer(b, dtype=np.int64, count=nk, offset=off)
        off += 8 * nk
        lens = np.frombuffer(b, dtype=np.int32, count=nk, offset=off)
        off += 4 * nk
        counts = {}
        for i in range(nk):
            ln = int(lens[i])
            counts[b[off : off + ln].decode()] = int(cnts[i])
            off += ln
        return cls(m=m, counts=counts, n=n, err_ub=err_ub)

    def result(self) -> dict:
        return {
            "top": self.top(10),
            "n": self.n,
            "err_ub": self.err_ub,
        }


# ---------------------------------------------------------------------------
# Fixed-bin histogram (PSI input)
# ---------------------------------------------------------------------------


@dataclass
class Histogram(_Serializable):
    """Fixed-range histogram with under/overflow bins; mergeable by
    element-wise add. The PSI drift check compares two of these."""

    lo: float
    hi: float
    bins: int = 20
    counts: np.ndarray = field(default=None)  # int64[bins+2]

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(self.bins + 2, dtype=np.int64)

    def _to_compact(self) -> bytes:
        counts = np.ascontiguousarray(self.counts, dtype=np.int64)
        return (
            struct.pack("<cddi", b"G", self.lo, self.hi, self.bins)
            + counts.tobytes()
        )

    @classmethod
    def _from_compact(cls, b: bytes) -> "Histogram":
        hsz = struct.calcsize("<cddi")
        tag, lo, hi, bins = struct.unpack("<cddi", b[:hsz])
        if tag != b"G":
            raise TypeError(f"Histogram: bad tag {tag!r}")
        counts = np.frombuffer(
            b, dtype=np.int64, count=bins + 2, offset=hsz
        ).copy()
        return cls(lo=lo, hi=hi, bins=bins, counts=counts)

    def update_array(self, arr) -> "Histogram":
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = arr.drop_null().to_numpy(zero_copy_only=False)
        x = np.asarray(arr, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size == 0:
            return self
        idx = np.floor((x - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64)
        idx = np.clip(idx + 1, 0, self.bins + 1)
        idx[x < self.lo] = 0
        idx[x >= self.hi] = self.bins + 1
        np.add.at(self.counts, idx, 1)
        return self

    def merge(self, other: "Histogram") -> "Histogram":
        if (other.lo, other.hi, other.bins) != (self.lo, self.hi, self.bins):
            raise ValueError("histogram shape mismatch")
        self.counts += other.counts
        return self

    def proportions(self, eps: float = 1e-6) -> np.ndarray:
        total = self.counts.sum()
        if total == 0:
            return np.full(self.counts.shape, eps)
        p = self.counts / total
        return np.maximum(p, eps)

    def result(self) -> dict:
        return {"counts": self.counts.tolist(), "lo": self.lo, "hi": self.hi}


def psi(baseline: Histogram, current: Histogram) -> float:
    """Population Stability Index over aligned bins:
    sum((p_cur - p_base) * ln(p_cur / p_base))."""
    pb = baseline.proportions()
    pc = current.proportions()
    return float(np.sum((pc - pb) * np.log(pc / pb)))


def categorical_psi(
    baseline: "MisraGries", current: "MisraGries", k: int = 50,
    eps: float = 1e-6,
) -> float:
    """PSI over CATEGORICAL frequencies from two Misra–Gries summaries
    — the numeric Histogram-PSI's counterpart for string columns (lang
    mix, host mix, event types). Categories = union of both sides'
    top-k; each side's remaining mass folds into an "other" bucket
    (non-negative by the MG undercount property). MG estimates only
    undercount by ≤ err_ub, so for true heavy categories (the ones PSI
    is sensitive to) the proportions are accurate to err_ub/n per
    side. Smoothing ``eps`` keeps the log finite for categories one
    side never saw."""
    cats = {c for c, _ in baseline.top(k)} | {c for c, _ in current.top(k)}
    cats = sorted(cats)

    def props(mg: "MisraGries") -> np.ndarray:
        n = max(mg.n, 1)
        known = np.array([mg.estimate(c) for c in cats], dtype=np.float64)
        other = max(0.0, n - known.sum())
        p = np.concatenate([known, [other]]) / n
        return np.maximum(p, eps)

    pb, pc = props(baseline), props(current)
    return float(np.sum((pc - pb) * np.log(pc / pb)))


def quantile_sketch_from_bytes(b: bytes):
    """Decode a quantile sketch of either backend by its format tag:
    b'K' → KLL, b'T' → TDigest, 0x80 → legacy pickle (t-digest era
    baselines on disk). Lets the validate/drift path carry KLL or
    t-digest bytes through the same binary columns."""
    if b[:1] == b"K":
        return KLL.from_bytes(b)
    return TDigest.from_bytes(b)


def new_quantile_sketch(kind: str = "tdigest"):
    """Factory for the configured quantile backend ('tdigest'|'kll')."""
    if kind == "kll":
        return KLL()
    if kind == "tdigest":
        return TDigest()
    raise ValueError(f"unknown quantile sketch {kind!r}")


def ks_statistic_kll(a: "KLL", b: "KLL") -> float:
    """Two-sample KS statistic from two KLL sketches: max CDF gap over
    the union of both sketches' retained items. Unlike the t-digest
    variant (interpolated centroids — step-CDF spikes on discrete
    columns, see DriftScorer's noise-floor note), the KLL items form a
    weighted EMPIRICAL distribution, so this evaluates the exact step
    CDFs of the summaries; the only error vs the true sample KS is the
    sketches' uniform rank error (≤ ~2×1.65% at k=200)."""
    va, wa = a._items()
    vb, wb = b._items()
    if va.size == 0 or vb.size == 0:
        return float("nan")
    grid = np.union1d(va, vb)
    cwa = np.concatenate([[0.0], np.cumsum(wa)])
    cwb = np.concatenate([[0.0], np.cumsum(wb)])
    fa = cwa[np.searchsorted(va, grid, side="right")] / cwa[-1]
    fb = cwb[np.searchsorted(vb, grid, side="right")] / cwb[-1]
    return float(np.max(np.abs(fa - fb)))


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic from two t-digests: max CDF
    gap evaluated on a merged quantile grid."""
    if a.n == 0 or b.n == 0:
        return float("nan")
    qs = np.linspace(0.0, 1.0, n_points)
    grid = np.unique(np.concatenate([a.quantiles(qs), b.quantiles(qs)]))

    def cdf(d: TDigest, xs: np.ndarray) -> np.ndarray:
        d._compress()
        if d.means.size == 0:
            return np.zeros_like(xs)
        w = d.weights
        cum = np.cumsum(w) - w / 2.0
        return np.interp(xs, d.means, cum / w.sum(), left=0.0, right=1.0)

    return float(np.max(np.abs(cdf(a, grid) - cdf(b, grid))))


# ---------------------------------------------------------------------------
# Bloom filter (approximate membership)
# ---------------------------------------------------------------------------


class BloomFilter(_Serializable):
    """Mergeable Bloom filter (Bloom 1970) — approximate set membership
    with NO false negatives and a bounded false-positive rate; the
    membership counterpart of the HLL cardinality sketch, completing
    the sketch family (Welford / t-digest / KLL / HLL / MG / Histogram
    / Bloom).

    Engine role: the cheap pre-filter for cross-batch membership
    probes — a 10^9-url seen-set is ~1.2 GB of bitset at 1% fp (vs the
    exact parquet hash index's ~8 GB + a scan per probe); only bloom
    HITS need the exact index. Trillion-row corpora shard the bitset
    by hash prefix (each shard is an independent BloomFilter, merge is
    per-shard OR).

    Vectorized double hashing (Kirsch & Mitzenmacher 2006):
    h_i(x) = h1(x) + i * h2(x) mod m, with h1 = hash64 and
    h2 = splitmix64(h1) | 1 (odd, so strides cycle the full ring for
    m a power of two). add/contains take whole Arrow/numpy arrays;
    merge is a word-wise OR (associative, commutative, idempotent —
    safe under salted two-level merges and task retries)."""

    _TAG = b"F"

    def __init__(self, m_bits: int = 1 << 23, k: int = 7):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.words = np.zeros(m_bits // 64, dtype=np.uint64)

    def _positions_from(self, h1: np.ndarray) -> np.ndarray:
        h2 = _splitmix64(h1) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.m_bits)).ravel()

    def _positions(self, values) -> np.ndarray:
        return self._positions_from(hash64(values))

    def add_hashes(self, h1: np.ndarray) -> "BloomFilter":
        """Add precomputed ``hash64`` values (the sharded path routes
        on the same hashes — computing them once for route + probe)."""
        if len(h1) == 0:
            return self
        pos = self._positions_from(np.asarray(h1, np.uint64))
        if not self.words.flags.writeable:  # plasma zero-copy deserialization
            self.words = self.words.copy()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        return self

    def add_array(self, values) -> "BloomFilter":
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return self
        return self.add_hashes(hash64(values))

    def contains_hashes(self, h1: np.ndarray) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_from(np.asarray(h1, np.uint64))
        bits = (
            self.words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.reshape(self.k, n).all(axis=0)

    def contains_array(self, values) -> np.ndarray:
        """Boolean membership per value — True may be a false positive
        (rate ~ occupancy^k), False is certain."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(hash64(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("cannot merge BloomFilters with different params")
        if not self.words.flags.writeable:  # plasma zero-copy deserialization
            self.words = self.words.copy()
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def fp_rate(self) -> float:
        """Estimated false-positive probability at current occupancy."""
        occ = float(np.unpackbits(self.words.view(np.uint8)).sum()) / self.m_bits
        return occ ** self.k

    def _to_compact(self) -> bytes:
        head = struct.pack("<cqq", self._TAG, self.m_bits, self.k)
        return head + self.words.tobytes()

    @classmethod
    def _from_compact(cls, b: bytes) -> "BloomFilter":
        tag, m_bits, k = struct.unpack("<cqq", b[:17])
        if tag != cls._TAG:
            raise TypeError(f"BloomFilter: bad tag {tag!r}")
        bf = cls(m_bits=m_bits, k=k)
        bf.words = np.frombuffer(b[17:], dtype=np.uint64).copy()
        return bf


_CANARY_SENTINEL = "__sod_bloom_canary__"


def hash_canary() -> int:
    """``hash64`` of a fixed sentinel string — persisted next to any
    hash-derived on-disk structure (Bloom sidecars). The string path
    of :func:`hash64` is polars aHash, documented stable only within
    a process/container; if a loaded sidecar's canary differs from
    the current process's, every persisted bit position is garbage
    and the structure MUST be rebuilt (a silently mismatched Bloom
    returns false negatives, which breaks the no-false-negative
    exactness contract downstream)."""
    return int(hash64(pa.array([_CANARY_SENTINEL]))[0])


class ShardedBloom:
    """Hash-prefix-sharded Bloom filter — the ≥10^9-hash tier of the
    membership sidecar, where one flat bitset stops being practical
    (10^10 hashes at ~10 bits/key is a 12 GB object: too big to ship
    per node, to rewrite per maintenance batch, or to hold per probe
    task).

    Shard = top ``log2(n_shards)`` bits of ``hash64`` (in-shard probe
    positions use the value's hash via the mod-m ring, so routing and
    probing are independent). Each shard is a standalone
    :class:`BloomFilter`, which buys, at scale:

    - **per-shard OR-merge**: partial blooms from parallel build tasks
      merge shard-by-shard (bounded per-merge memory = one shard, and
      the merges parallelize across shards), still idempotent / safe
      under task retries;
    - **per-shard persistence**: the sidecar is a directory of shard
      files — a maintenance batch rewrites ~shard_bytes per dirty
      shard, never one monolithic file, and a crashed write loses at
      most one shard (rebuildable from the index);
    - **routed probes**: a batch hash-partitioned by the same prefix
      probes with ONE shard resident per task (~m_bits/n_shards/8
      bytes) instead of broadcasting the full bitset to every node.

    The flat :class:`BloomFilter` remains the right shape below ~10^9
    hashes (one object, one ``ray.put``); ``n_shards=1`` degenerates
    to exactly that.
    """

    _TAG = b"S"

    def __init__(
        self, n_shards: int = 16, m_bits_per_shard: int = 1 << 23, k: int = 7
    ):
        if n_shards < 1 or (n_shards & (n_shards - 1)):
            raise ValueError("n_shards must be a power of two")
        self.n_shards = int(n_shards)
        self._shift = np.uint64(64 - int(n_shards).bit_length() + 1)
        self.shards = [
            BloomFilter(m_bits_per_shard, k) for _ in range(n_shards)
        ]
        # shards touched since construction/load — a persistence layer
        # rewrites only these (per-shard maintenance, not a monolith)
        self.dirty: set[int] = set()

    @property
    def m_bits(self) -> int:
        return self.shards[0].m_bits * self.n_shards

    @property
    def k(self) -> int:
        return self.shards[0].k

    def route(self, h1: np.ndarray) -> np.ndarray:
        if self.n_shards == 1:
            return np.zeros(len(h1), np.int64)
        return (np.asarray(h1, np.uint64) >> self._shift).astype(np.int64)

    def _by_shard(self, h1: np.ndarray):
        """Yield (shard_id, hash-slice) for each non-empty shard, via
        one stable argsort — O(n log n) once, not n_shards masks."""
        sid = self.route(h1)
        order = np.argsort(sid, kind="stable")
        hs = np.asarray(h1, np.uint64)[order]
        bounds = np.searchsorted(sid[order], np.arange(self.n_shards + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                yield s, hs[lo:hi]

    def add_hashes(self, h1: np.ndarray) -> "ShardedBloom":
        for s, hs in self._by_shard(h1):
            self.shards[s].add_hashes(hs)
            self.dirty.add(s)
        return self

    def add_array(self, values) -> "ShardedBloom":
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return self
        return self.add_hashes(hash64(values))

    def contains_hashes(self, h1: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=bool)
        if len(h1) == 0:
            return out
        sid = self.route(h1)
        order = np.argsort(sid, kind="stable")
        hs = np.asarray(h1, np.uint64)[order]
        bounds = np.searchsorted(sid[order], np.arange(self.n_shards + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                out[order[lo:hi]] = self.shards[s].contains_hashes(hs[lo:hi])
        return out

    def contains_array(self, values) -> np.ndarray:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(hash64(values))

    def merge(self, other: "ShardedBloom") -> "ShardedBloom":
        if (self.n_shards, self.m_bits, self.k) != (
            other.n_shards, other.m_bits, other.k,
        ):
            raise ValueError("cannot merge ShardedBloom with different params")
        for s, (a, b) in enumerate(zip(self.shards, other.shards)):
            if b.words.any():
                a.merge(b)
                self.dirty.add(s)
        return self

    def fp_rate(self) -> float:
        """Probe-weighted fp estimate: uniform hashes route uniformly,
        so the mean of per-shard rates; ``max`` via
        :meth:`fp_rate_max` for the conservative saturation check."""
        return float(np.mean([s.fp_rate() for s in self.shards]))

    def fp_rate_max(self) -> float:
        return float(max(s.fp_rate() for s in self.shards))

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<cqqq", self._TAG, self.n_shards, self.shards[0].m_bits, self.k
        )
        return head + b"".join(s.words.tobytes() for s in self.shards)

    @classmethod
    def from_bytes(cls, b: bytes) -> "ShardedBloom":
        tag, n_shards, m_bits, k = struct.unpack("<cqqq", b[:25])
        if tag != cls._TAG:
            raise TypeError(f"ShardedBloom: bad tag {tag!r}")
        sb = cls(n_shards=n_shards, m_bits_per_shard=m_bits, k=k)
        step = m_bits // 8
        off = 25
        for s in range(n_shards):
            sb.shards[s].words = np.frombuffer(
                b[off : off + step], dtype=np.uint64
            ).copy()
            off += step
        return sb


# ---------------------------------------------------------------------------
# Count-Min sketch (approximate frequencies)
# ---------------------------------------------------------------------------


class CountMin(_Serializable):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) — approximate
    per-item frequencies with a ONE-SIDED guarantee: the estimate
    never undercounts, and overcounts by more than ``e·N/width`` with
    probability at most ``(1/e)^depth`` (N = total count mass).
    Completes the sketch family next to Misra-Gries: MG answers "which
    items are heavy" with a deterministic band; Count-Min answers
    "how often does THIS item occur" for any queried item, including
    ones MG evicted.

    Vectorized: ``depth`` hash rows via the Bloom-style double hashing
    (h1 + i·h2, i < depth) over one ``hash64`` pass; add/estimate take
    whole Arrow/numpy arrays; merge is an element-wise counter sum
    (associative/commutative — safe under salted two-level merges).
    NOTE merge is NOT idempotent (unlike Bloom's OR) — merging the
    same partial twice double-counts, the same contract as every
    counting sketch here (Welford, MG)."""

    _TAG = b"C"

    def __init__(self, width: int = 1 << 14, depth: int = 4):
        self.width = int(width)
        self.depth = int(depth)
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total count mass (for the error bound)

    def _cols(self, values) -> np.ndarray:
        h1 = hash64(values)
        h2 = _splitmix64(h1) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.width)).astype(np.int64)

    def add_array(self, values, weights=None) -> "CountMin":
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        m = len(values)
        if m == 0:
            return self
        if not self.counts.flags.writeable:  # plasma zero-copy
            self.counts = self.counts.copy()
        w = (
            np.ones(m, np.int64)
            if weights is None
            else np.asarray(weights, np.int64)
        )
        cols = self._cols(values)
        for d in range(self.depth):
            np.add.at(self.counts[d], cols[d], w)
        self.n += int(w.sum())
        return self

    def estimate_array(self, values) -> np.ndarray:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return np.zeros(0, np.int64)
        cols = self._cols(values)
        return np.min(
            np.stack(
                [self.counts[d][cols[d]] for d in range(self.depth)]
            ),
            axis=0,
        )

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge CountMin with different params")
        if not self.counts.flags.writeable:
            self.counts = self.counts.copy()
        self.counts += other.counts
        self.n += other.n
        return self

    def error_bound(self, slack: float = math.e) -> float:
        """Overcount bound ``slack·N/width`` (slack=e gives the
        published (1/e)^depth failure probability)."""
        return slack * self.n / self.width

    def _to_compact(self) -> bytes:
        head = struct.pack(
            "<cqqq", self._TAG, self.width, self.depth, self.n
        )
        return head + self.counts.tobytes()

    @classmethod
    def _from_compact(cls, b: bytes) -> "CountMin":
        tag, width, depth, n = struct.unpack("<cqqq", b[:25])
        if tag != cls._TAG:
            raise TypeError(f"CountMin: bad tag {tag!r}")
        cm = cls(width=width, depth=depth)
        cm.counts = (
            np.frombuffer(b[25:], dtype=np.int64)
            .reshape(depth, width)
            .copy()
        )
        cm.n = n
        return cm
