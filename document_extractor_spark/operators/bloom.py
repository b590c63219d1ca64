"""Bloom-filter-accelerated snapshot-ingest dedup — the membership-set
compression tier between "broadcast the whole index as a hash relation"
(dies around 10^8 keys) and "shuffle-anti-join both sides" (always
correct, but moves the whole new batch through an exchange even when
almost nothing matches).

A Bloom filter over the known-fingerprint index is ~10 bits/key at 1%
false-positive rate — 10-100x smaller than a broadcast hash set — and
has NO false negatives, so it splits an incoming crawl batch into:

* definite-fresh rows (bit miss): keep immediately, NO join, no
  shuffle of their payload at all — at monthly-ingest ratios this is
  ~95%+ of the batch;
* candidate rows (bit hit): true duplicates plus an fpp-sized sliver of
  false positives — only THESE take the exact anti-join against the
  index.

The final result is therefore EXACTLY ``drop_known_duplicates``'s (the
bloom is a pre-filter, never the verdict). Build shape mirrors the KMV
sketch (``sketch.py``): partition-local numpy bitmaps (mapInPandas, one
~bits/8-byte row per partition), OR-merged — the merge is a semilattice
(commutative/associative/idempotent), so the result is
partitioning-invariant — then shipped to the probe as a closure.
``num_bits`` is the executor/driver memory bound: 2^30 bits = 128 MiB
handles ~10^8 keys at 1% fpp; past ~10^10 keys the bitmap itself stops
fitting and the plain anti-join (or a per-index-partition bloom) is the
right tier — the op asserts the sizing instead of silently degrading to
an all-candidate pass.

No new hashing: the fingerprint IS md5 (``functions.text.fingerprint``),
so the filter's k=4 probe positions are the four big-endian 32-bit words
of the digest reduced mod ``num_bits`` — deterministic across engines
and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import content_hash


def _probe_positions(hex_fps, num_bits: int) -> np.ndarray:
    """(n, 4) int64 bit positions from md5-hex fingerprints: the four
    32-bit digest words mod num_bits. Vectorized except the C-level
    per-row ``bytes.fromhex``."""
    raw = b"".join(bytes.fromhex(x) for x in hex_fps)
    words = np.frombuffer(raw, dtype=">u4").reshape(-1, 4)
    return words.astype(np.int64) % num_bits


def build_fingerprint_bloom(known: DataFrame,
                            fingerprint_col: str = "fingerprint",
                            num_bits: int = 1 << 23) -> tuple:
    """Known-fingerprint index → ``(bitmap_bytes, n_keys)``
    (little-endian bit order within each byte; n_keys counts non-null
    fingerprints, riding the same pass as the build). Distributed:
    one bitmap per partition, OR-merged in a single final task, ONE
    row collected."""
    if num_bits % 8 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 8")
    nbytes = num_bits // 8

    def partial(batches):
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            fps = pdf[fingerprint_col].dropna()
            if len(fps) == 0:
                continue
            n += len(fps)
            pos = _probe_positions(fps.to_numpy(), num_bits).ravel()
            np.bitwise_or.at(bitmap, pos >> 3,
                             (1 << (pos & 7)).astype(np.uint8))
        if n:
            yield pd.DataFrame({"bm": [bitmap.tobytes()], "n": [n]})

    def merge(batches):
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        n = 0
        for pdf in batches:
            for bm, pn in zip(pdf["bm"], pdf["n"]):
                bitmap |= np.frombuffer(bm, dtype=np.uint8)
                n += int(pn)
        yield pd.DataFrame({"bm": [bitmap.tobytes()], "n": [n]})

    partials = (
        known.select(fingerprint_col)
        .mapInPandas(partial, "bm binary, n long")
    )
    rows = (partials.repartition(1)
            .mapInPandas(merge, "bm binary, n long").collect())
    if not rows:
        return bytes(nbytes), 0
    return bytes(rows[0]["bm"]), int(rows[0]["n"])


def drop_known_duplicates_bloom(new_docs: DataFrame, known: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                fingerprint_col: str = "fingerprint",
                                num_bits: int = 1 << 23,
                                max_fpp: float = 0.25) -> DataFrame:
    """``drop_known_duplicates`` with a Bloom pre-filter: result is
    row-identical (the bloom has no false negatives; candidates are
    exactly re-checked), but only bit-HIT rows pay the index anti-join.
    The in-batch min-id dedup still sees every row — same contract.

    The index side builds the bitmap (two jobs, one collected row);
    the batch side is a vectorized Arrow probe (4 bit tests/row)
    against the closure-captured bitmap — Spark serializes it into the
    task binary once per executor, the same distribution path a
    broadcast variable takes.

    An UNDERSIZED bitmap silently saturates — every row becomes a
    candidate and the pre-filter buys nothing while still paying the
    probe — so the estimated false-positive rate
    ``(1 - e^(-4n/m))^4`` is checked against ``max_fpp`` and the op
    fails loudly with the required ``num_bits`` instead (the n_keys
    count rides the build pass; no extra job)."""
    bitmap_bytes, n_keys = build_fingerprint_bloom(known, fingerprint_col,
                                                   num_bits)
    est_fpp = (1.0 - float(np.exp(-4.0 * n_keys / num_bits))) ** 4
    if est_fpp > max_fpp:
        raise ValueError(
            f"bloom undersized: {n_keys} keys in {num_bits} bits gives "
            f"estimated fpp {est_fpp:.3f} > max_fpp {max_fpp}; size "
            f"num_bits >= ~10*n_keys (or use drop_known_duplicates)")

    def probe(batches):
        bitmap = np.frombuffer(bitmap_bytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            # NULL fingerprint (NULL text) can never match the index —
            # definite-fresh, same as the exact op's NULL-key anti-join
            mask = pdf["_fp"].notna().to_numpy()
            cand = np.zeros(len(pdf), dtype=bool)
            if mask.any():
                pos = _probe_positions(
                    pdf["_fp"].to_numpy()[mask], num_bits)
                cand[mask] = ((bitmap[pos >> 3] >> (pos & 7)) & 1) \
                    .all(axis=1)
            pdf["_candidate"] = cand
            yield pdf

    keyed = new_docs.withColumn("_fp", content_hash(text_col))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    ) + ", _candidate boolean"
    # persisted: four downstream consumers (hit side, miss side, the
    # survivors groupBy, the final semi-join) would otherwise each
    # re-run the Arrow probe AND content_hash over the full batch text
    probed = keyed.mapInPandas(probe, schema).persist()
    idx = known.select(F.col(fingerprint_col).alias("_fp"))
    hits = probed.where(F.col("_candidate"))
    fresh = (
        probed.where(~F.col("_candidate"))
        .unionByName(hits.join(idx, on="_fp", how="left_anti"))
    )
    survivors = fresh.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return (
        fresh.join(survivors, on=["_fp", id_col], how="left_semi")
        .drop("_fp", "_candidate")
    )
