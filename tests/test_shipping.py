"""Content-addressed worker-package shipping (shipping.build_pkg_zip).

The archive filename embeds a manifest hash, so structural changes —
deleting, renaming, adding a module — always produce a fresh zip; a
newest-mtime staleness check would keep serving deleted modules forever
(the mtime of a deletion is the mtime of nothing).
"""

from __future__ import annotations

import os
import sys
import zipfile

from eth_event_stream_spark.shipping import build_pkg_zip


def _mkpkg(base, files: dict[str, str]) -> str:
    pkg = base / "mypkg"
    for rel, body in files.items():
        p = pkg / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    return str(pkg)


def test_deleted_module_is_not_a_ghost(tmp_path):
    """Delete a module, rebuild: the new archive has a NEW name and no
    longer contains the module — a worker adding it to sys.path cannot
    import the ghost."""
    pkg = _mkpkg(
        tmp_path, {"__init__.py": "", "a.py": "X = 1\n", "b.py": "Y = 2\n"}
    )
    out = str(tmp_path / "out")
    os.makedirs(out)
    z1 = build_pkg_zip(pkg, out_dir=out)
    assert set(zipfile.ZipFile(z1).namelist()) == {
        "mypkg/__init__.py",
        "mypkg/a.py",
        "mypkg/b.py",
    }

    os.remove(os.path.join(pkg, "b.py"))
    z2 = build_pkg_zip(pkg, out_dir=out)
    assert z2 != z1, "deletion did not change the archive identity"
    assert "mypkg/b.py" not in zipfile.ZipFile(z2).namelist()

    # the import-level proof: only the fresh archive on the path
    sys.path.insert(0, z2)
    try:
        import importlib

        importlib.invalidate_caches()
        mod = importlib.import_module("mypkg.a")
        assert mod.X == 1
        try:
            importlib.import_module("mypkg.b")
            raise AssertionError("ghost module importable from stale zip")
        except ModuleNotFoundError:
            pass
    finally:
        sys.path.remove(z2)
        for m in [m for m in sys.modules if m.startswith("mypkg")]:
            del sys.modules[m]


def test_unchanged_content_reuses_archive(tmp_path):
    """Same manifest -> same path, and the existing file is NOT rewritten
    (cheap no-op on every ship_package call)."""
    pkg = _mkpkg(tmp_path, {"__init__.py": "", "a.py": "X = 1\n"})
    out = str(tmp_path / "out")
    os.makedirs(out)
    z1 = build_pkg_zip(pkg, out_dir=out)
    mtime1 = os.path.getmtime(z1)
    z2 = build_pkg_zip(pkg, out_dir=out)
    assert z2 == z1
    assert os.path.getmtime(z2) == mtime1


def test_edited_module_changes_archive(tmp_path):
    """Editing a file (mtime/size change) produces a fresh archive with the
    new content — the property the old newest-mtime check also had, kept."""
    pkg = _mkpkg(tmp_path, {"__init__.py": "", "a.py": "X = 1\n"})
    out = str(tmp_path / "out")
    os.makedirs(out)
    z1 = build_pkg_zip(pkg, out_dir=out)
    a = os.path.join(pkg, "a.py")
    with open(a, "w") as f:
        f.write("X = 42  # changed\n")
    os.utime(a, ns=(os.stat(a).st_mtime_ns + 10**9,) * 2)
    z2 = build_pkg_zip(pkg, out_dir=out)
    assert z2 != z1
    assert b"X = 42" in zipfile.ZipFile(z2).read("mypkg/a.py")
