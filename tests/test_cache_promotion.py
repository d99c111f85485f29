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


def test_leftover_replacement_never_rmtrees_live_root(tmp_path, monkeypatch):
    """The crash-leftover branch must move the old root ASIDE with an
    atomic rename, never shutil.rmtree the live root path: two builders
    can both observe root-without-_DONE, and an in-place rmtree lets the
    slower one destroy the faster one's just-promoted COMPLETE root and
    leaves a window with no root at all."""
    import shutil as _shutil

    root = tmp_path / "cache"
    root.mkdir()
    (root / "table").write_text("torn")
    done = str(root / "_DONE")
    stage = _mk_stage(tmp_path, "cache.stage-x", "fresh")

    removed = []
    real_rmtree = _shutil.rmtree

    def spying_rmtree(path, *a, **kw):
        removed.append(os.path.normpath(str(path)))
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(_shutil, "rmtree", spying_rmtree)
    _promote_cache_dir(stage, str(root), done)
    assert os.path.normpath(str(root)) not in removed
    assert open(str(root / "table")).read() == "fresh"
    assert os.path.exists(done)


def test_leftover_race_both_builders_leave_complete_root(tmp_path):
    """Interleave the race the advisor described: B passes the _DONE
    check while it is still false, A promotes a complete root, then B
    runs its leftover-replacement. Whatever wins, the surviving root is
    COMPLETE (_DONE present) — B must not tear A's root down in place."""
    root = tmp_path / "cache"
    root.mkdir()
    (root / "table").write_text("torn")  # pre-crash leftover, no _DONE
    done = str(root / "_DONE")
    a = _mk_stage(tmp_path, "cache.stage-a", "A")
    b = _mk_stage(tmp_path, "cache.stage-b", "B")
    # A replaces the leftover and promotes a complete root
    _promote_cache_dir(a, str(root), done)
    assert os.path.exists(done)
    # B (which raced past the done-check earlier) now promotes too
    _promote_cache_dir(b, str(root), done)
    assert os.path.exists(done)
    assert open(str(root / "table")).read() in ("A", "B")
    assert not os.path.exists(b)
