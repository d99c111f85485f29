"""Crash/concurrency safety of the build-once index cache promotion.

Two gate runs (or a gate racing a bench) may both decide to build the
same warm ANN/logreg index. Each must stage under a unique directory and
atomically rename into place — a shared Hadoop ``_temporary`` dir is what
aborted a real gate run mid-round-6. These tests pin the promotion
contract without Spark: winner's tables survive, loser's staging is
discarded, crash leftovers (root without _DONE) are replaced.
"""

import os

from __spark_entry__ import _promote_cache_dir, _stage_root


def _mk_stage(tmp_path, name, payload):
    stage = tmp_path / name
    stage.mkdir()
    (stage / "table").write_text(payload)
    (stage / "_DONE").write_text("v1")
    return str(stage)


def test_promote_into_empty_root(tmp_path):
    root = str(tmp_path / "cache")
    done = os.path.join(root, "_DONE")
    stage = _mk_stage(tmp_path, "cache.stage-a", "mine")
    _promote_cache_dir(stage, root, done)
    assert os.path.exists(done)
    assert open(os.path.join(root, "table")).read() == "mine"
    assert not os.path.exists(stage)


def test_loser_adopts_winner(tmp_path):
    root = str(tmp_path / "cache")
    done = os.path.join(root, "_DONE")
    winner = _mk_stage(tmp_path, "cache.stage-w", "winner")
    loser = _mk_stage(tmp_path, "cache.stage-l", "loser")
    _promote_cache_dir(winner, root, done)
    _promote_cache_dir(loser, root, done)
    # winner's tables intact; loser's staging cleaned up
    assert open(os.path.join(root, "table")).read() == "winner"
    assert not os.path.exists(loser)


def test_crash_leftover_root_is_replaced(tmp_path):
    # a pre-promotion crash can only leave a root WITHOUT _DONE (legacy
    # in-place builds); a fresh builder must replace it
    root = tmp_path / "cache"
    root.mkdir()
    (root / "table").write_text("torn")
    done = str(root / "_DONE")
    stage = _mk_stage(tmp_path, "cache.stage-n", "fresh")
    _promote_cache_dir(stage, str(root), done)
    assert open(str(root / "table")).read() == "fresh"
    assert open(done).read() == "v1"


def test_stage_root_is_builder_unique(tmp_path):
    root = str(tmp_path / "cache")
    a, b = _stage_root(root), _stage_root(root)
    assert a != b
    assert a.startswith(root + ".stage-") and b.startswith(root + ".stage-")
