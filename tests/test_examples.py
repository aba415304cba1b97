"""The examples/ scripts must stay runnable (the reference ships a
runnable example; so do we)."""

from __future__ import annotations

import runpy
import sys


def _run(path, argv):
    old = sys.argv
    sys.argv = [path] + argv
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


def test_event_analytics_example(spark, sf_dir, capsys):
    _run("examples/event_analytics.py", [sf_dir])
    out = capsys.readouterr().out
    assert "converting users" in out


def test_curate_example(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "corpus")
    _run("examples/curate_corpus.py", [sf_dir, dest])
    assert spark.read.parquet(dest).count() > 0


def test_cdc_example_reconciles(spark, sf_dir, tmp_path, capsys):
    _run("examples/cdc_pipeline.py", [sf_dir, str(tmp_path / "cdc")])
    assert "agree" in capsys.readouterr().out


def test_scale_toolkit_example(spark, sf_dir, tmp_path, capsys):
    _run("examples/scale_toolkit.py", [sf_dir, str(tmp_path / "scale")])
    out = capsys.readouterr().out
    assert "z-ordered" in out
    assert "top-5 nodes by rank" in out


def test_media_and_index_example(spark, sf_dir, tmp_path, capsys):
    _run("examples/media_and_index.py", [sf_dir, str(tmp_path / "media")])
    out = capsys.readouterr().out
    assert "media_and_index done" in out


def test_incremental_indexes_example(sf_dir, tmp_path):
    _run("examples/incremental_indexes.py", [sf_dir, str(tmp_path / "idx")])


def test_spans_and_components_example(spark, sf_dir, tmp_path, capsys):
    _run("examples/spans_and_components.py", [sf_dir, str(tmp_path / "r10")])
    out = capsys.readouterr().out
    assert "duplicated-coverage gate" in out
    assert "component size distribution" in out


def test_examples_leave_shared_session_alive(spark):
    """Examples run IN-PROCESS on the shared session (get_spark is a
    getOrCreate): an example calling spark.stop() kills every test
    collected after this file — exactly what incremental_indexes.py
    did once.  Defined last in this module (pytest runs tests in
    definition order), so it observes the session state after all
    examples ran."""
    assert spark.range(1).count() == 1


def test_data_skipping_example(spark, sf_dir, tmp_path, capsys):
    _run("examples/data_skipping.py", [sf_dir, str(tmp_path / "skip")])
    out = capsys.readouterr().out
    assert "range probe" in out
    assert "bloom keeps" in out


def test_versioned_publish_example(spark, sf_dir, tmp_path, capsys):
    _run("examples/versioned_publish.py", [sf_dir, str(tmp_path / "pub")])
    out = capsys.readouterr().out
    assert "published v2; pointer=2" in out
    assert "out-of-domain probe: 0 rows" in out
    assert "absent key: 0 rows" in out
    assert "crashed partial v3 refused" in out
    assert "vacuum(keep=1) removed versions [1, 3]" in out
