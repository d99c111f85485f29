"""Session factory sizing: the driver heap must respect the container's
cgroup memory limit, not just the host's /proc/meminfo (which reports
HOST memory inside Docker/K8s without lxcfs)."""

from __future__ import annotations

from grape_vector_db_spark import session


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert session._default_driver_mem() == "3g"


def test_driver_mem_format_and_clamp(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    mem = session._default_driver_mem()
    assert mem.endswith("g")
    assert 4 <= int(mem[:-1]) <= 24


def test_cgroup_limit_caps_host_memory(monkeypatch):
    """A 16 GiB cgroup limit on a (stubbed) 128 GiB host must cap the
    heap at half the LIMIT (8g), not half the host memory — both sides
    stubbed so the assertion holds on any machine."""
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    monkeypatch.setattr(session, "_host_mem_bytes", lambda: 128 * 1024**3)
    monkeypatch.setattr(
        session, "_cgroup_limit_bytes", lambda: 16 * 1024**3
    )
    assert session._default_driver_mem() == "8g"
    # and without a limit, half the (stubbed) host, clamped to 24g
    monkeypatch.setattr(session, "_cgroup_limit_bytes", lambda: None)
    assert session._default_driver_mem() == "24g"


def test_cgroup_unlimited_is_ignored(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    monkeypatch.setattr(session, "_cgroup_limit_bytes", lambda: None)
    mem = session._default_driver_mem()
    assert 4 <= int(mem[:-1]) <= 24


def test_cgroup_limit_bytes_parses_current_system():
    """On any Linux the probe returns None (unlimited / files absent) or
    a positive byte count — never raises."""
    out = session._cgroup_limit_bytes()
    assert out is None or out > 0
