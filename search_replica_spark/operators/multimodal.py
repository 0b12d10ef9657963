"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The image/audio decode libraries are not in this container, so the decode
step is a clearly-marked deterministic stub (``FAKE_DECODE``) — but the
Spark-side plumbing is real: binary columns, Arrow-batched mapInPandas,
stable output schema, partition-preserving transforms. Swap ``_fake_decode``
for a real PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from search_replica_spark.operators import load, register

FAKE_DECODE = True  # container has no image/audio libs; deterministic stub


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder (see module docstring)."""
    if not FAKE_DECODE:
        raise NotImplementedError("real image decode requires PIL/libvips")
    n = len(payload)
    return {"width": n % 640 + 1, "height": n % 480 + 1, "channels": 3}


# Metadata extraction over binary payloads — SQL-checkable because the stub
# derives metadata from byte length only.
@register(
    "mm_image_meta",
    """SELECT doc_id, strlen(text) AS n_bytes,
              strlen(text) % 640 + 1 AS width,
              strlen(text) % 480 + 1 AS height,
              3 AS channels
       FROM documents""",
)
def mm_image_meta(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            out.insert(1, "n_bytes", pdf["payload"].map(len).astype("int64"))
            yield out.astype(
                {"width": "int64", "height": "int64", "channels": "int32"}
            )

    return payloads.mapInPandas(
        fn, schema="doc_id long, n_bytes long, width long, height long, channels int"
    )


# Shared twin plumbing: recover the UTF-8 BYTE stream in pure SQL via
# hex(encode(text)) → per-byte hex-pair decode. Every multimodal twin
# below frames/samples the same bytes the Spark side sees through
# np.frombuffer, so the oracles hold for non-ASCII corpora too (ADVICE
# r4: the old char-indexed twins only agreed on ASCII).
_BYTES_CTE = """
s AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
b AS (SELECT doc_id, h,
             unnest(generate_series(1, CAST(length(h) // 2 AS BIGINT))) AS pos
      FROM s),
ch AS (SELECT doc_id,
              16 * (strpos('0123456789ABCDEF',
                           substr(h, CAST(2 * pos - 1 AS BIGINT), 1)) - 1)
                 + (strpos('0123456789ABCDEF',
                           substr(h, CAST(2 * pos AS BIGINT), 1)) - 1) AS v,
              pos
       FROM b)
"""

# Feature extraction stub: integer byte statistics (sum / sum-of-squares) of
# the payload — the batch shape, schema, and Arrow path of a real embedding
# extractor, but exactly reproducible in SQL, so the driver's DuckDB oracle
# checks it bit-for-bit. mean derives from the sums as one float64
# division, identical in both engines.
_MM_FEAT_SQL = f"""
WITH {_BYTES_CTE}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bytes,
       CAST(sum(v) AS BIGINT) AS byte_sum,
       CAST(sum(v * v) AS BIGINT) AS byte_sqsum,
       round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS byte_mean
FROM ch GROUP BY doc_id
"""


@register("mm_fake_features", _MM_FEAT_SQL)
def mm_fake_features(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf["payload"].map(len).to_numpy("int64")
            # empty payloads are dropped up front (the SQL twin's unnest
            # emits no rows for them) — this also keeps the reduceat index
            # list strictly increasing and in-bounds, so no clamping that
            # could split the last non-empty row's segment
            keep = lens > 0
            if not keep.any():
                continue
            kl = lens[keep]
            buf = np.frombuffer(b"".join(pdf["payload"][keep]), dtype=np.uint8).astype(np.int64)
            starts = np.cumsum(kl) - kl
            s = np.add.reduceat(buf, starts)
            sq = np.add.reduceat(buf * buf, starts)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"][keep].to_numpy("int64"),
                    "n_bytes": kl,
                    "byte_sum": s,
                    "byte_sqsum": sq,
                }
            )

    out = payloads.mapInPandas(
        fn, schema="doc_id long, n_bytes long, byte_sum long, byte_sqsum long"
    )
    return out.withColumn("byte_mean", F.round(F.col("byte_sum") / F.col("n_bytes"), 6))


# Resize stub ("thumbnail"): deterministic downsampling of the payload to a
# 16-point byte grid — the Spark-side shape of an image resize (fixed output
# dims regardless of input size). Scalar outputs so the DuckDB twin compares
# exactly: 4 grid samples + the 16-point checksum.
_MM_THUMB_SQL = f"""
WITH {_BYTES_CTE},
L AS (SELECT doc_id, count(*) AS n FROM ch GROUP BY doc_id HAVING count(*) >= 16),
g AS (SELECT doc_id, n, unnest(generate_series(0, 15)) AS i FROM L),
sel AS (SELECT g.doc_id, g.i, ch.v
        FROM g JOIN ch ON ch.doc_id = g.doc_id AND ch.pos = (g.i * g.n) // 16 + 1)
SELECT doc_id,
       CAST(max(CASE WHEN i = 0 THEN v END) AS BIGINT) AS p0,
       CAST(max(CASE WHEN i = 4 THEN v END) AS BIGINT) AS p25,
       CAST(max(CASE WHEN i = 8 THEN v END) AS BIGINT) AS p50,
       CAST(max(CASE WHEN i = 12 THEN v END) AS BIGINT) AS p75,
       CAST(sum(v) AS BIGINT) AS checksum
FROM sel GROUP BY doc_id
"""


@register("mm_fake_thumbnail", _MM_THUMB_SQL)
def mm_fake_thumbnail(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf["payload"].map(len).to_numpy("int64")
            keep = lens >= 16
            if not keep.any():
                continue
            buf = np.frombuffer(b"".join(pdf["payload"][keep]), dtype=np.uint8).astype(np.int64)
            kl = lens[keep]
            starts = np.cumsum(kl) - kl
            # 16-point grid per payload, fully vectorized
            grid = (np.arange(16)[None, :] * kl[:, None]) // 16 + starts[:, None]
            g = buf[grid]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"][keep].to_numpy("int64"),
                    "p0": g[:, 0],
                    "p25": g[:, 4],
                    "p50": g[:, 8],
                    "p75": g[:, 12],
                    "checksum": g.sum(axis=1),
                }
            )

    return payloads.mapInPandas(
        fn, schema="doc_id long, p0 long, p25 long, p50 long, p75 long, checksum long"
    )


# Frame-sample stub ("video"): treat the payload as fixed-size frames and
# sample the first / middle / last frame's byte sum — the plumbing of frame
# extraction (seek + bounded decode), exactly reproducible in SQL.
FRAME_BYTES = 256

_MM_FRAMES_SQL = f"""
WITH {_BYTES_CTE},
fr AS (SELECT doc_id, (pos - 1) // {FRAME_BYTES} AS frame,
              CAST(sum(v) AS BIGINT) AS fsum, count(*) AS cnt
       FROM ch GROUP BY doc_id, (pos - 1) // {FRAME_BYTES}),
ff AS (SELECT doc_id, frame, fsum FROM fr WHERE cnt = {FRAME_BYTES}),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames
       FROM ff GROUP BY doc_id)
SELECT DISTINCT f.doc_id, nf.n_frames, CAST(f.frame AS BIGINT) AS frame_idx,
       f.fsum AS frame_sum
FROM ff f JOIN nf USING (doc_id)
WHERE f.frame IN (0, nf.n_frames // 2, nf.n_frames - 1)
"""


@register("mm_frame_sample", _MM_FRAMES_SQL)
def mm_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # vectorized seek + bounded "decode": same grid-gather pattern
            # as mm_fake_thumbnail — no per-row Python loop
            lens = pdf["payload"].map(len).to_numpy("int64")
            keep = lens >= FRAME_BYTES
            if not keep.any():
                continue
            buf = np.frombuffer(b"".join(pdf["payload"][keep]), dtype=np.uint8).astype(np.int64)
            kl = lens[keep]
            starts = np.cumsum(kl) - kl
            nf = kl // FRAME_BYTES
            # candidate frames per doc: first / middle / last, deduplicated
            # (n=1 → all three coincide; n=2 → middle == last)
            fidx = np.stack([np.zeros_like(nf), nf // 2, nf - 1], axis=1)
            dedup = np.ones(fidx.shape, dtype=bool)
            dedup[:, 1] = fidx[:, 1] != fidx[:, 0]
            dedup[:, 2] = (fidx[:, 2] != fidx[:, 1]) & (fidx[:, 2] != fidx[:, 0])
            rows, cols = np.nonzero(dedup)
            sel_fi = fidx[rows, cols]
            offs = starts[rows] + sel_fi * FRAME_BYTES
            sums = buf[offs[:, None] + np.arange(FRAME_BYTES)[None, :]].sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"][keep].to_numpy("int64")[rows],
                    "n_frames": nf[rows],
                    "frame_idx": sel_fi,
                    "frame_sum": sums,
                }
            )

    return payloads.mapInPandas(
        fn, schema="doc_id long, n_frames long, frame_idx long, frame_sum long"
    )


# Audio plumbing: payload treated as 8-bit PCM mono samples, framed into
# 256-sample windows, per-frame energy = sum((v - 128)^2) — the VAD /
# loudness-gate feature a speech-data pipeline computes before filtering.
# Same honest-stub contract as the image ops: a real pipeline swaps the
# byte view for an ffmpeg decode; the Spark side (Arrow batches, framing,
# per-frame schema, vectorized reduceat) is the production shape and the
# integer arithmetic is exactly reproducible in SQL.
#
# Both engines frame UTF-8 BYTES (ADVICE r4: the old twin framed
# characters, which only agreed on ASCII corpora). The twin recovers the
# byte stream in pure SQL via hex(encode(text)) → per-byte hex-pair
# decode, so frame boundaries and energies are byte-identical to the
# numpy view for any input, non-ASCII included.
FRAME = 256

_MM_AUDIO_SQL = f"""
WITH {_BYTES_CTE}
SELECT doc_id, CAST((pos - 1) // {FRAME} AS BIGINT) AS frame,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS energy
FROM ch GROUP BY doc_id, (pos - 1) // {FRAME}
"""


@register("mm_audio_frame_energy", _MM_AUDIO_SQL)
def mm_audio_frame_energy(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            ids, frames, counts, energies = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                if v.size == 0:
                    continue
                d2 = (v - 128) ** 2
                cuts = np.arange(0, v.size, FRAME)
                e = np.add.reduceat(d2, cuts)
                n = np.diff(np.append(cuts, v.size))
                ids.append(np.full(cuts.size, doc_id, dtype=np.int64))
                frames.append(np.arange(cuts.size, dtype=np.int64))
                counts.append(n.astype(np.int64))
                energies.append(e)
            if not ids:
                continue
            yield pd.DataFrame({
                "doc_id": np.concatenate(ids),
                "frame": np.concatenate(frames),
                "n_samples": np.concatenate(counts),
                "energy": np.concatenate(energies),
            })

    return payloads.mapInPandas(
        fn, schema="doc_id long, frame long, n_samples long, energy long"
    )
