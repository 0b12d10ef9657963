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


# Feature extraction stub (rows-only check): mean/std of payload bytes —
# the batch shape, schema, and Arrow path of a real embedding extractor.
@register("mm_fake_features", None)
def mm_fake_features(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def fn(batches):
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                rows.append((int(did), round(float(a.mean()), 6), round(float(a.std()), 6)))
            yield pd.DataFrame(rows, columns=["doc_id", "byte_mean", "byte_std"])

    return payloads.mapInPandas(fn, schema="doc_id long, byte_mean double, byte_std double")
