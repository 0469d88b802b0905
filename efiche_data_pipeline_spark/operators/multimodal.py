"""Multimodal (binary) column operators: typed media columns, magic-byte
type sniffing, content-hash dedup, and the Arrow-batched feature
extraction plumbing for image-like payloads.

Design for 100 TB of media: the binary payload is an opaque
``binary`` column that is NEVER shuffled — every operator derives a
small typed projection (length, 4-byte magic prefix, 128-bit content
hash) map-side and aggregates/joins only those. Decode-heavy work runs
through ``mapInPandas`` (Arrow batches, one Python round-trip per
batch, not per row) and keeps its output schema explicit so the
pipeline composes with plain relational operators.

Reference analogue: the reference stores image *identifiers* only
(``image_id``, reference: sql/01_schema.sql:106) and never touches
pixel data; this family is the north-star extension (BASELINE.json)
that makes media a first-class column.

The actual image decode is STUBBED: the container has no image codec
library (no PIL/cv2), so :func:`extract_image_features` uses a
deterministic fake decoder over the content hash unless a real decoder
is importable. The Spark-side contract — schema, batching, partition
behavior — is real and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-byte prefixes (first 4 bytes, hex) for the sniffer.
MAGIC_PREFIXES: dict[str, str] = {
    "png": "89504E47",
    "jpeg": "FFD8FFE0",
    "gif": "47494638",
}


def synthesize_content(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fixture adapter: the driver's ``documents`` table has no binary
    column, so derive one deterministically — a rotating magic-byte
    header + the utf-8 text bytes. DuckDB reproduces it exactly with
    ``unhex(header) || encode(text)``, which is what makes the
    multimodal queries oracle-checkable."""
    i = F.col(id_col)
    header = (
        F.when(F.pmod(i, 3) == 0, F.unhex(F.lit(MAGIC_PREFIXES["png"])))
        .when(F.pmod(i, 3) == 1, F.unhex(F.lit(MAGIC_PREFIXES["jpeg"])))
        .otherwise(F.unhex(F.lit(MAGIC_PREFIXES["gif"])))
    )
    return df.select(
        i, F.concat(header, F.encode(F.col(text_col), "utf-8")).alias("content")
    )


def sniff_media_type(content: str | Column) -> Column:
    """Magic-byte media-type sniff over the first 4 bytes. Hex-string
    comparison (``hex`` is portable to any engine), evaluated map-side
    on the scan — the binary itself never moves."""
    c = F.col(content) if isinstance(content, str) else content
    prefix = F.substring(F.hex(c), 1, 8)
    out = F.lit("unknown")
    expr = F.when(F.lit(False), "x")
    for name, magic in MAGIC_PREFIXES.items():
        expr = expr.when(prefix == magic, name)
    return expr.otherwise(out)


def content_fingerprint(content: str | Column) -> Column:
    """128-bit content hash as md5 of the hex encoding — portable
    (DuckDB: ``md5(hex(content))``) and computed before any shuffle."""
    c = F.col(content) if isinstance(content, str) else content
    return F.md5(F.hex(c))


def binary_stats(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Typed per-item projection: media type, byte length, fingerprint."""
    return df.select(
        F.col(id_col),
        sniff_media_type(content_col).alias("media_type"),
        F.length(F.col(content_col)).alias("content_len"),
        content_fingerprint(content_col).alias("fp"),
    )


def content_hash_dedup(
    df: DataFrame, id_col: str, content_col: str = "content"
) -> DataFrame:
    """Exact binary dedup groups — same shape as the text
    ``exact_dedup`` (operators/dedup.py): the shuffle key is the
    32-char fingerprint, never the payload."""
    return (
        binary_stats(df, id_col, content_col)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(f"keeper_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
            F.first("media_type").alias("media_type"),
        )
    )


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, decoder string"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: width/height derived
    from an md5 over the UPPERCASE hex encoding of the payload — the
    repo's portable-fingerprint convention (:func:`content_fingerprint`),
    so any engine reproduces it as
    ``h = int(md5(hex(content))[:8], 16); (64 + h % 1024,
    64 + (h // 1024) % 1024)`` (DuckDB blob SQL: the q41 oracle).
    Stable across processes (builtin ``hash`` is salted per
    interpreter). Replace with a real codec when available."""
    import hashlib

    digest = hashlib.md5(payload.hex().upper().encode("ascii")).digest()
    h = int.from_bytes(digest[:4], "big")
    return 64 + h % 1024, 64 + (h // 1024) % 1024


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: the generic shape for decode / resize /
    frame-sample stages. Each Python worker receives columnar batches
    (id + payload), emits one typed feature row per item, and holds at
    most one batch in memory — at scale, parallelism is the parquet
    split count and no shuffle is involved.

    Decoding uses PIL when importable, otherwise the deterministic
    fake (this container ships no codec; the fake keeps the pipeline
    testable end-to-end)."""
    try:  # pragma: no cover - codec not present in this container
        from PIL import Image  # noqa: F401

        decoder = "pil"
    except ImportError:
        decoder = "fake"

    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[content_col]
            if decoder == "pil":  # pragma: no cover
                import io

                from PIL import Image

                sizes = []
                for b in payloads:
                    try:
                        with Image.open(io.BytesIO(b)) as im:
                            sizes.append(im.size)
                    except Exception:
                        sizes.append((0, 0))
            else:
                sizes = [_fake_decode(bytes(b)) for b in payloads]
            hexes = payloads.map(lambda b: bytes(b)[:4].hex().upper())
            magic_to_name = {v: k for k, v in MAGIC_PREFIXES.items()}
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": hexes.map(lambda h: magic_to_name.get(h, "unknown")),
                    "n_bytes": payloads.map(len),
                    "width": [w for w, _ in sizes],
                    "height": [h for _, h in sizes],
                    "decoder": decoder,
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, IMAGE_FEATURE_SCHEMA
    )


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset int, frame_len int, frame_fp string"
)


def sample_media_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    frame_size: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling over binary payloads — the 1:N ``mapInPandas``
    shape (one input item → many frame rows) that video/audio
    pipelines need, as opposed to the 1:1 feature-extraction shape of
    :func:`extract_image_features`. Every ``stride``-th ``frame_size``
    pseudo-frame is emitted with its offset and content fingerprint.

    The frame *decode* is stubbed (no codec in this container): frames
    are fixed-size byte segments of the payload. A real demuxer (pyav,
    ffmpeg) slots into ``_frames`` without touching the Spark contract:
    Arrow batches in, a typed frame table out, fan-out bounded by
    payload_len / (frame_size × stride) per item, no shuffle anywhere.

    ``frame_fp`` follows the repo's portable-fingerprint convention
    (:func:`content_fingerprint`): md5 over the UPPERCASE hex encoding
    of the frame bytes, reproducible in any engine as
    ``md5(substring(hex(content), off*2+1, frame_size*2))``.
    """
    import hashlib

    import pandas as pd

    def _frames(payload: bytes):
        n = max((len(payload) + frame_size - 1) // frame_size, 1)
        for idx in range(0, n, stride):
            seg = payload[idx * frame_size : (idx + 1) * frame_size]
            fp = hashlib.md5(seg.hex().upper().encode("ascii")).hexdigest()
            yield idx, idx * frame_size, len(seg), fp

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame_len": [],
                "frame_fp": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[content_col]):
                for idx, off, ln, fp in _frames(bytes(payload)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(ln)
                    rows["frame_fp"].append(fp)
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


@dataclass(frozen=True)
class IncrementalBinaryDedupResult:
    kept: DataFrame
    n_new: int
    n_dup_vs_history: int  # fresh items whose fingerprint is already indexed
    n_dup_within: int  # fresh items beaten by a smaller id in the batch
    index_version: int
    index_delta: DataFrame | None = None  # only with commit=False


def incremental_binary_dedup(
    new_media: DataFrame,
    store,
    index_table: str = "binary_fp_index",
    id_col: str = "doc_id",
    content_col: str = "content",
    commit: bool = True,
) -> IncrementalBinaryDedupResult:
    """Exact content-hash dedup of a new MEDIA batch against all
    history — the multimodal member of the incremental family
    (operators/dedup.py:incremental_minhash_dedup is the near-dup
    text form). The persisted index is (id, fp) rows — 32-char
    fingerprints, never payloads — committed as O(batch) layered
    deltas (store.append_version); the payload column is read once
    map-side to fingerprint the batch and never shuffles.

    Keeper rule: an item survives iff its fingerprint is unseen in
    history AND it has the smallest id for that fingerprint within
    the batch — which under monotone ids equals the global
    min-id-per-fingerprint rule (q40), so batch-by-batch ≡ one global
    dedup, oracle-checked by q108. Replays are filtered by id up
    front: nothing re-kept, nothing re-committed.

    ``commit=False`` returns the batch's (id, fp) delta in
    ``index_delta`` instead of committing it — the same hook as the
    text twin (operators/dedup.py:incremental_minhash_dedup), so a
    crash-safe caller can persist the kept frame into its sink FIRST
    and commit the index LAST (a crash in between makes the replay
    recompute the same kept set and converge; a caller that commits
    via the result but crashes before persisting ``kept`` would
    otherwise lose those docs forever — replay would find every id
    already indexed and keep nothing)."""
    stats = binary_stats(new_media, id_col, content_col).select(id_col, "fp")
    current = store.current_version(index_table)
    hist = store.read_union(index_table) if current is not None else None
    fresh = (
        stats.join(hist.select(id_col), id_col, "left_anti")
        if hist is not None
        else stats
    ).localCheckpoint(eager=True)
    n_new = fresh.count()
    if n_new == 0:
        return IncrementalBinaryDedupResult(
            kept=new_media.limit(0),
            n_new=0,
            n_dup_vs_history=0,
            n_dup_within=0,
            index_version=current if current is not None else 0,
        )
    keeper = fresh.groupBy("fp").agg(F.min(id_col).alias("_keep"))
    batch_first = fresh.join(keeper, "fp").filter(
        F.col(id_col) == F.col("_keep")
    )
    if hist is not None:
        hist_fps = hist.select("fp").distinct()
        kept_ids = batch_first.join(hist_fps, "fp", "left_anti").select(id_col)
        n_hist = fresh.join(hist_fps, "fp", "left_semi").count()
    else:
        kept_ids = batch_first.select(id_col)
        n_hist = 0
    kept_ids = kept_ids.localCheckpoint(eager=True)
    n_kept = kept_ids.count()
    delta = fresh.select(id_col, "fp")
    if commit:
        version = store.append_version(delta, index_table)
        return IncrementalBinaryDedupResult(
            kept=new_media.join(kept_ids, id_col, "left_semi"),
            n_new=n_new,
            n_dup_vs_history=n_hist,
            n_dup_within=n_new - n_hist - n_kept,
            index_version=version,
        )
    return IncrementalBinaryDedupResult(
        kept=new_media.join(kept_ids, id_col, "left_semi"),
        n_new=n_new,
        n_dup_vs_history=n_hist,
        n_dup_within=n_new - n_hist - n_kept,
        index_version=current if current is not None else 0,
        index_delta=delta,
    )
