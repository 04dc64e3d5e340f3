"""The examples/ scripts must stay runnable — they are the switch-over
story for a reference user."""

import os
import sys

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def test_curation_pipeline_funnel(spark):
    sys.path.insert(0, EXAMPLES)
    try:
        from curation_pipeline import build
    finally:
        sys.path.pop(0)
    stages = build(spark, "/root/testdata/sf0.001")
    counts = {name: df.count() for name, df in stages.items()}
    # the funnel only narrows through the filtering stages...
    assert counts["input"] >= counts["gated"] >= counts["exact_deduped"] \
        >= counts["near_deduped"] >= counts["decontaminated"] > 0
    # ...and chunking can expand again; ordering preserves cardinality
    assert counts["ordered"] == counts["packed"] > 0


def test_extensions_example_runs(spark):
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, os.path.join(EXAMPLES, "extensions.py")],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "stream fn:" in r.stdout


def test_multimodal_example(spark):
    sys.path.insert(0, EXAMPLES)
    try:
        from multimodal_pipeline import build
    finally:
        sys.path.pop(0)
    out = build(spark)
    feats = {r.media_id: r for r in out["features"].collect()}
    assert set(feats) == {1, 2}
    # checkerboard: half the 192 channel bytes in bin 0, half in bin 15
    assert feats[1].histogram[0] == 96 and feats[1].histogram[15] == 96
    audio = {r.media_id: r for r in out["audio"].collect()}
    assert audio[3].sample_rate == 16000 and audio[4].sample_rate == 8000
    assert audio[3].rms > audio[4].rms
    assert out["thumbs"].count() == 2 and out["frames"].count() > 0
