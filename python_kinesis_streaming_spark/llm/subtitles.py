"""Subtitle ingestion (SRT + WebVTT) and subtitle↔frame alignment —
the step that turns video + captions into (frame, text) training pairs
for multimodal models.

Parsing is a per-file kernel behind the usual Arrow seam (`subtitle
files are KBs`); alignment is pure DataFrame algebra: a cue covers a
sampled frame when ``start_ms <= pts_ms < end_ms``, realized as a
time-BUCKETIZED equi-join (the same plan shape as the registry's
join_range_bucketed) so a trillion (frame, cue) candidates never form
a cross product — each frame joins only the cues in its time bucket.

``parse_subtitles(text)`` handles both formats from their public specs:
SRT (index line, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``, blank-line-
separated blocks) and WebVTT (``WEBVTT`` magic, dot milliseconds,
optional cue ids/settings, NOTE/STYLE blocks skipped). Formatting tags
(``<i>``, ``{\\an8}``) are stripped; multi-line cue text joins with a
single space.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TS_SRT = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
_TS_VTT_SHORT = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_TAGS = re.compile(r"<[^>]+>|\{\\[^}]*\}")


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_subtitles(text: str) -> list[dict]:
    """SRT or WebVTT text → [{cue_index, start_ms, end_ms, text}].

    Malformed blocks are skipped (quarantine discipline: a bad cue
    never breaks the file). Raises ValueError only when NO cue parses
    and the input is non-empty garbage.
    """
    # A UTF-8 BOM decodes to U+FEFF at the START of the text; strip it
    # before format detection (str.strip() does NOT remove it — it is a
    # Cf format character, not whitespace), else a BOM-prefixed WebVTT
    # file misses the WEBVTT magic and NOTE/STYLE blocks get parsed.
    text = text.lstrip("﻿")
    is_vtt = text.lstrip().startswith("WEBVTT")
    cues = []
    block: list[str] = []

    def flush(block: list[str]):
        if not block:
            return
        # find the timing line (first line containing -->)
        for i, line in enumerate(block):
            m = _TS_SRT.search(line) or _TS_VTT_SHORT.search(line)
            if m and "-->" in line:
                g = m.groups()
                start = _ms(g[0], g[1], g[2], g[3])
                end = _ms(g[4], g[5], g[6], g[7])
                body = " ".join(
                    _TAGS.sub("", ln).strip() for ln in block[i + 1 :]
                ).strip()
                if end > start and body:
                    cues.append(
                        {
                            "cue_index": len(cues),
                            "start_ms": start,
                            "end_ms": end,
                            "text": body,
                        }
                    )
                return

    for raw in text.splitlines():
        line = raw.lstrip("﻿").strip()
        if not line:
            flush(block)
            block = []
            continue
        if is_vtt and not block and (
            line.startswith(("WEBVTT", "NOTE", "STYLE", "REGION"))
        ):
            continue
        block.append(line)
    flush(block)
    if not cues and text.strip() and not text.lstrip().startswith("WEBVTT"):
        if not any("-->" in ln for ln in text.splitlines()):
            raise ValueError("no subtitle cues found")
    return cues


def subtitles_frame(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """(id, payload bytes/str) rows → one row per cue:
    (id, cue_index, start_ms, end_ms, text). Arrow-batched kernel;
    malformed files become error:<reason> rows (cue_index = -1)."""

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    text = (
                        payload
                        if isinstance(payload, str)
                        else bytes(payload).decode("utf-8", "replace")
                    )
                    for cue in parse_subtitles(text):
                        rows.append({"id": rid, **cue})
                except ValueError as e:
                    rows.append(
                        {
                            "id": rid,
                            "cue_index": -1,
                            "start_ms": None,
                            "end_ms": None,
                            "text": f"error:{e}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "cue_index", "start_ms", "end_ms", "text"],
            )

    return df.mapInPandas(
        parse_batches,
        schema=(
            "id long, cue_index int, start_ms long, end_ms long, "
            "text string"
        ),
    )


def align_frames_to_cues(
    frames: DataFrame,
    cues: DataFrame,
    bucket_ms: int = 10_000,
    frame_keys: tuple[str, ...] = ("id", "frame_index"),
) -> DataFrame:
    """Attach covering cues to sampled frames: one output row per
    (frame, cue with ``start_ms <= pts_ms < end_ms``, same video id);
    frames covered by no cue are kept once with null cue columns so
    caption-coverage gaps stay measurable.

    Plan shape (the join_range_bucketed pattern): each cue is exploded
    to the time buckets it spans (bounded by duration/bucket_ms);
    frames equi-join on (id, bucket); the exact range predicate
    filters; uncovered frames come back via one anti-join. No
    (frames × cues) product at any scale.
    """
    c = cues.where(F.col("cue_index") >= 0).select(
        F.col("id").alias("vid"),
        "cue_index",
        "start_ms",
        "end_ms",
        F.col("text").alias("cue_text"),
        F.explode(
            F.sequence(
                (F.col("start_ms") / bucket_ms).cast("long"),
                ((F.col("end_ms") - 1) / bucket_ms).cast("long"),
            )
        ).alias("bucket"),
    )
    f = frames.select(
        "*",
        (F.col("pts_ms") / bucket_ms).cast("long").alias("bucket"),
        F.col("id").alias("vid"),
    )
    keys = list(frame_keys)
    matched = (
        f.join(c, ["vid", "bucket"])
        .where(
            (F.col("start_ms") <= F.col("pts_ms"))
            & (F.col("pts_ms") < F.col("end_ms"))
        )
        .select(
            *frames.columns, "cue_index", "cue_text", "start_ms", "end_ms"
        )
        # a cue spanning several buckets matches the same frame once
        # per bucket — collapse to one row per (frame, cue)
        .dropDuplicates(keys + ["cue_index"])
    )
    uncovered = frames.join(
        matched.select(*keys).distinct(), keys, "left_anti"
    ).select(
        "*",
        F.lit(None).cast("int").alias("cue_index"),
        F.lit(None).cast("string").alias("cue_text"),
        F.lit(None).cast("long").alias("start_ms"),
        F.lit(None).cast("long").alias("end_ms"),
    )
    return matched.unionByName(uncovered)
