"""SRT/WebVTT parsing and subtitle↔frame alignment semantics."""

from __future__ import annotations

import numpy as np
import pytest

from python_kinesis_streaming_spark.llm.subtitles import (
    align_frames_to_cues,
    parse_subtitles,
    subtitles_frame,
)

SRT = """\
1
00:00:01,000 --> 00:00:03,500
Hello there.

2
00:00:04,000 --> 00:00:06,000
<i>Formatted</i> line one
line two

garbage block without timing

3
00:01:00,000 --> 00:01:02,000
{\\an8}Top text
"""

VTT = """\
WEBVTT

NOTE this is a comment
and continues

intro
00:01.000 --> 00:03.500
Hello there.

00:00:04.000 --> 00:00:06.000 align:start
Second cue
"""


def test_parse_srt_blocks_timing_and_tag_strip():
    cues = parse_subtitles(SRT)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1000, 3500), (4000, 6000), (60000, 62000),
    ]
    assert cues[0]["text"] == "Hello there."
    assert cues[1]["text"] == "Formatted line one line two"
    assert cues[2]["text"] == "Top text"
    assert [c["cue_index"] for c in cues] == [0, 1, 2]


def test_parse_vtt_skips_notes_and_handles_short_timestamps():
    cues = parse_subtitles(VTT)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1000, 3500), (4000, 6000),
    ]
    assert cues[1]["text"] == "Second cue"


def test_parse_garbage_raises():
    with pytest.raises(ValueError):
        parse_subtitles("this is not a subtitle file at all")


def test_subtitles_frame_rows_and_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(SRT.encode())),
            (2, bytearray(b"complete nonsense")),
        ],
        "vid long, payload binary",
    )
    rows = subtitles_frame(df, "vid", "payload").collect()
    ok = [r for r in rows if r["cue_index"] >= 0]
    err = [r for r in rows if r["cue_index"] == -1]
    assert len(ok) == 3 and all(r["id"] == 1 for r in ok)
    assert len(err) == 1 and err[0]["id"] == 2
    assert err[0]["text"].startswith("error:")


def test_align_frames_to_cues_range_semantics(spark):
    frames = spark.createDataFrame(
        [
            (1, 0, 500),     # before any cue → uncovered
            (1, 1, 1000),    # exactly at start → covered by cue 0
            (1, 2, 3499),    # last ms of cue 0
            (1, 3, 3500),    # end is exclusive → uncovered
            (1, 4, 61000),   # covered by cue 2 (different bucket)
            (2, 0, 1500),    # other video: no cues at all
        ],
        "id long, frame_index int, pts_ms long",
    )
    cues = spark.createDataFrame(
        [(1, c["cue_index"], c["start_ms"], c["end_ms"], c["text"])
         for c in parse_subtitles(SRT)],
        "id long, cue_index int, start_ms long, end_ms long, text string",
    )
    out = {
        (r["id"], r["frame_index"]): r
        for r in align_frames_to_cues(frames, cues, bucket_ms=2000).collect()
    }
    assert len(out) == 6  # every frame exactly once here
    assert out[(1, 0)]["cue_index"] is None
    assert out[(1, 1)]["cue_text"] == "Hello there."
    assert out[(1, 2)]["cue_text"] == "Hello there."
    assert out[(1, 3)]["cue_index"] is None
    assert out[(1, 4)]["cue_text"] == "Top text"
    assert out[(2, 0)]["cue_index"] is None


def test_align_cue_spanning_many_buckets_matches_once(spark):
    frames = spark.createDataFrame(
        [(1, 0, 5000)], "id long, frame_index int, pts_ms long"
    )
    cues = spark.createDataFrame(
        [(1, 0, 0, 60000, "long cue")],
        "id long, cue_index int, start_ms long, end_ms long, text string",
    )
    rows = align_frames_to_cues(frames, cues, bucket_ms=1000).collect()
    assert len(rows) == 1 and rows[0]["cue_text"] == "long cue"


def test_end_to_end_mkv_frames_to_captions(spark):
    from python_kinesis_streaming_spark.llm.jpeg_codec import encode_jpeg
    from python_kinesis_streaming_spark.llm.mkv_codec import build_mkv
    from python_kinesis_streaming_spark.llm.video_codecs import (
        video_frames_frame,
    )

    rng = np.random.default_rng(8)
    payloads = [
        encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    mkv = build_mkv(payloads, width=16, height=16, fps=1)  # 1 fps → 1s/frame
    vids = spark.createDataFrame(
        [(7, "mkv", bytearray(mkv))], "vid long, fmt string, payload binary"
    )
    frames = video_frames_frame(vids, "vid", "fmt", "payload")
    subs = spark.createDataFrame(
        [(7, bytearray(b"1\n00:00:00,500 --> 00:00:02,500\nmid caption\n"))],
        "vid long, payload binary",
    )
    cues = subtitles_frame(subs, "vid", "payload")
    out = {
        r["frame_index"]: r["cue_text"]
        for r in align_frames_to_cues(frames, cues, bucket_ms=1000).collect()
    }
    # frames at 0,1000,2000,3000 ms; cue covers [500, 2500)
    assert out[0] is None
    assert out[1] == "mid caption" and out[2] == "mid caption"
    assert out[3] is None


def test_parse_vtt_with_utf8_bom_detects_format():
    # a BOM-prefixed WebVTT file must still hit the WEBVTT magic so the
    # NOTE block (whose text contains '-->') is skipped, not parsed
    bom_vtt = "﻿WEBVTT\n\nNOTE fake 00:00:01.000 --> 00:00:02.000\n\n" \
        "00:01.000 --> 00:03.500\nReal cue\n"
    cues = parse_subtitles(bom_vtt)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == [
        (1000, 3500, "Real cue"),
    ]
