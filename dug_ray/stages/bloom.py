"""Bloom-filter build + probe: the scale-path semi-join prefilter.

At TPC-H scale the semi-join key set (~1/5 of orders) is too big to
broadcast as an exact set; the standard shape is a Bloom prefilter + exact
join on the survivors:

- **build**: one bitmap per batch of the key side (a vectorized
  double-hashing scheme over ``pandas.util.hash_array`` — deterministic
  across processes), OR-merged associatively. The merged filter is
  ``m_bits/8`` bytes regardless of key count — broadcastable.
- **probe**: a vectorized membership test per batch of the big side. False
  positives pass (bounded by the classic ``(1-e^{-kn/m})^k``), false
  negatives never happen, so following the prefilter with an exact
  partitioned ``hash_join`` yields exactly the semi-join while moving only
  the surviving fraction through the exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

BLOOM_BITS = 1 << 20   # 128 KiB bitmap
BLOOM_K = 4

_KEY2 = "1234567890abcdef"  # second pandas hash key for double hashing


def _bit_positions(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing: idx_j = h1 + j*h2 (mod m).

    Hashes the DICTIONARY of the key column (the shuffle._stable_hash_array
    shape): O(unique) hash work on the hot probe path, and — critically —
    null-safe and dtype-stable. Hashing the raw numpy view would let one
    null flip an int64 batch to float64 and change EVERY value's hash,
    producing silent false negatives between build and probe batches.
    Nulls take a fixed slot (never match a real key)."""
    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) \
        else pa.array(values)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = arr.dictionary_encode()
    uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    h1u = pd.util.hash_array(uniq)
    h2u = pd.util.hash_array(uniq, hash_key=_KEY2) | np.uint64(1)  # odd -> full cycle
    codes = enc.indices
    if codes.null_count:
        codes = pc.fill_null(codes, -1)
        h1u = np.append(h1u, np.uint64(0))
        h2u = np.append(h2u, np.uint64(1))
    idx = codes.to_numpy(zero_copy_only=False).astype(np.int64)
    h1 = h1u[idx].astype(np.uint64)
    h2 = h2u[idx].astype(np.uint64)
    j = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_bloom(ds: ray.data.Dataset, col: str, m_bits: int = BLOOM_BITS,
                k: int = BLOOM_K) -> bytes:
    """Mergeable build: per-batch partial bitmaps, OR-merged (associative —
    order and block splits irrelevant). Driver traffic is O(batches x m_bits/8)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits, dtype=bool)
        if len(batch):
            bits[_bit_positions(batch.column(col), m_bits, k).ravel()] = True
        return pa.table({"bitmap": pa.array([np.packbits(bits).tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    partial = ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
    for b in partial.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b.column("bitmap").to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    return merged.tobytes()


def probe_mask(values: np.ndarray, bloom: np.ndarray, m_bits: int = BLOOM_BITS,
               k: int = BLOOM_K) -> np.ndarray:
    """Vectorized membership test (bool mask; no false negatives)."""
    if not len(values):
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(values, m_bits, k)
    bits = (bloom[pos >> 3] >> (7 - (pos & 7))) & 1
    return bits.all(axis=1).astype(bool)


def bloom_semi_join(large: ray.data.Dataset, large_key: str,
                    small: ray.data.Dataset, small_key: str,
                    m_bits: int = BLOOM_BITS, k: int = BLOOM_K,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT semi-join of ``large`` against ``small``'s keys: Bloom
    prefilter (broadcast bytes, vectorized probe) + partitioned hash_join
    of the survivors. Requires unique keys on the small side for inner ==
    semi (the caller's contract, as with hash_join semi use)."""
    from dug_ray.shuffle import hash_join

    # pin the small side once: build_bloom consumes it and hash_join reads
    # it again — without this the side's upstream pipeline executes twice
    small = small.materialize()
    bloom_ref = ray.put(np.frombuffer(
        build_bloom(small, small_key, m_bits, k), dtype=np.uint8))

    def prefilter(batch: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        return batch.filter(pa.array(
            probe_mask(batch.column(large_key), bloom, m_bits, k)))

    survivors = large.map_batches(prefilter, batch_format="pyarrow", batch_size=None)
    return hash_join(small, survivors, small_key, large_key, num_buckets)


def bloom_anti_join(large: ray.data.Dataset, large_key: str,
                    small: ray.data.Dataset, small_key: str,
                    m_bits: int = BLOOM_BITS, k: int = BLOOM_K,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT anti-join of ``large`` against ``small``'s keys — the scale
    path for subtracting a too-big-to-broadcast key set (decontamination's
    contaminated-id set in the adversarial corpus-sized case).

    Bloom filters have no false negatives, so every large row that FAILS
    the probe is definitely absent from ``small`` and bypasses the exchange
    entirely; only probe-PASSING candidates (true matches + the bounded
    false-positive fraction) go through the exact partitioned
    ``hash_anti_join``.  Both sides are materialized once: ``small`` is
    read by the Bloom build and again by the exchange; ``large`` feeds the
    two complementary probe branches (at production scale the large side
    is a checkpointed/narrow projection — keep it to the key + carried
    columns, never payload text).  Column names must be disjoint, as with
    ``hash_join``.  Output columns = ``large``'s columns."""
    from dug_ray.shuffle import hash_anti_join

    small = small.materialize()
    large = large.materialize()
    bloom_ref = ray.put(np.frombuffer(
        build_bloom(small, small_key, m_bits, k), dtype=np.uint8))

    def probe_branch(passing: bool):
        def _f(batch: pa.Table) -> pa.Table:
            if large_key not in batch.column_names or not len(batch):
                return batch  # empty-result schema-loss quirk upstream
            bloom = ray.get(bloom_ref)
            mask = probe_mask(batch.column(large_key), bloom, m_bits, k)
            return batch.filter(pa.array(mask if passing else ~mask))
        return _f

    clean = large.map_batches(probe_branch(False),
                              batch_format="pyarrow", batch_size=None)
    candidates = large.map_batches(probe_branch(True),
                                   batch_format="pyarrow", batch_size=None)
    kept = hash_anti_join(candidates, small, large_key, small_key, num_buckets)
    return clean.union(kept)
