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
