"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extraction runs as Arrow-batched pandas over
``mapInPandas``. The decode step itself is STUBBED (no image/audio libs
in this container — see ``decode_image_stub``), but the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("decoded", T.BooleanType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    UTF-8 bytes of the text (stands in for encoded image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.length(text_col).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _pil():
    """The optional imaging dependency, or None. Resolved at call time
    (inside the Arrow worker too) so installing PIL on the executors is
    all a deployment needs."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def decode_image_stub(payload: bytes) -> "object":
    """Where a real pipeline calls PIL/libvips. Deliberately stubbed:
    the container has no imaging libs; at deployment, swap in
    ``PIL.Image.open(io.BytesIO(payload))`` here."""
    raise NotImplementedError("image decode requires PIL/libvips — not in this container")


def decode_image(payload: bytes) -> "object":
    """Real decode when PIL is importable (returns a PIL.Image), else
    the declared stub raise — the single swap-in point for both
    :func:`decode_dimensions` and ``extract_features(try_decode=True)``."""
    Image = _pil()
    if Image is None:
        return decode_image_stub(payload)
    import io

    return Image.open(io.BytesIO(payload))


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)


def decode_dimensions(media: DataFrame) -> DataFrame:
    """REAL image decode over the Arrow batch path (PIL required on the
    executors — gated by ``importorskip`` in tests, the stub raise
    otherwise): one pandas batch in, per-row decoded dimensions out.
    Undecodable payloads yield ok=False rows rather than failing the
    batch — at corpus scale a poison payload must never kill the job."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, oks, ws, hs, modes = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    img = decode_image(payload)
                    oks.append(True)
                    ws.append(img.size[0])
                    hs.append(img.size[1])
                    modes.append(img.mode)
                except NotImplementedError:
                    raise
                except Exception:
                    oks.append(False)
                    ws.append(None)
                    hs.append(None)
                    modes.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="Int64"),
                    "ok": oks,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "mode": modes,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan_columns(max_dim: int) -> list:
    """The aspect-ratio resize-plan math as appendable Columns (longer
    side bounded to ``max_dim``, no upscaling) — so callers can fuse
    the plan into another pass instead of paying a join."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    longer = F.greatest(w, h)
    scale = F.least(F.lit(1.0), F.lit(float(max_dim)) / longer)
    return [
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.greatest(F.lit(1), F.floor(w * scale).cast("int")).alias("target_width"),
        F.greatest(F.lit(1), F.floor(h * scale).cast("int")).alias("target_height"),
        (longer > max_dim).alias("needs_resize"),
    ]


def plan_resize(media: DataFrame, max_dim: int) -> DataFrame:
    """Resize planning — the aspect-ratio math, JVM-side.

    Emits per-media target dimensions bounding the longer side to
    ``max_dim`` (no upscaling). The pixel kernel itself would run in
    the same ``mapInPandas`` pattern as :func:`extract_features` with
    ``PIL.Image.resize`` inside (stubbed here — no imaging libs in this
    container); the PLAN is what the engine owns: pure Column math, so
    Catalyst can partition-prune and the Python boundary only ever sees
    rows that actually need work (``needs_resize``).
    """
    return media.select("media_id", *resize_plan_columns(max_dim))


def sample_frame_offsets(media: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling plan: one row per (media_id, frame_offset_ms) at
    a fixed stride over the clip duration — ``sequence`` + ``explode``,
    fully JVM-side. The frame-grab kernel (ffmpeg/PyAV seek+decode) is
    the stubbed deployment point, same contract as
    :func:`decode_image_stub`; the fan-out, ordering, and offset math
    the engine owns are real and oracle-checked."""
    dur = F.col("meta.duration_ms")
    offsets = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
    return (
        media.where(dur.isNotNull() & (dur > 0))
        .select("media_id", dur.alias("duration_ms"), F.explode(offsets).alias("frame_offset_ms"))
    )


def extract_features(
    media: DataFrame, try_decode: bool = False, pass_through: list[str] | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape: pandas DataFrame per Arrow batch; ``payload`` arrives
    as bytes objects in a Series — operations stay whole-column. The
    (stubbed) decode is attempted per batch only when try_decode=True.

    ``pass_through``: input columns copied verbatim to the output — the
    fusion hook that lets JVM-computed columns (e.g. the resize plan)
    ride through the one Arrow pass instead of paying a self-join to
    reattach them (at corpus scale: one scan, zero shuffles, vs two
    scans plus an exchange per side).
    """
    pt = list(pass_through or [])
    out_schema = T.StructType(
        list(FEATURES_SCHEMA.fields)
        + [media.schema[c] for c in pt]
    )

    def _features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            payload = pdf["payload"]
            decoded = False
            if try_decode:
                try:
                    decode_image(payload.iloc[0] if len(payload) else b"")
                    decoded = True
                except Exception:
                    decoded = False
            out = {
                "media_id": pdf["media_id"],
                "byte_len": payload.map(lambda b: len(b) if b is not None else None).astype("Int64"),
                "payload_md5": payload.map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
                "decoded": decoded,
            }
            for c in pt:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(_features, schema=out_schema)
