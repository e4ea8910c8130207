"""Git connector (S2): clone, glob filters, blob-SHA change hints."""

from __future__ import annotations

import os
import subprocess

import pytest

from semantik_spark.sources.git import changed_files, clone_or_fetch, enumerate_repo


def _git(args, cwd):
    subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True,
        env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
             "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
             "HOME": cwd, "PATH": "/usr/bin:/bin"},
    )


@pytest.fixture(scope="module")
def origin(tmp_path_factory):
    repo = tmp_path_factory.mktemp("origin")
    (repo / "README.md").write_text("# demo repo")
    (repo / "main.py").write_text("print('v1')")
    sub = repo / "docs"
    sub.mkdir()
    (sub / "guide.md").write_text("guide text")
    (repo / "binary.dat").write_bytes(b"\x00\x01")
    _git(["init", "-q", "-b", "main"], str(repo))
    _git(["add", "-A"], str(repo))
    _git(["commit", "-q", "-m", "v1"], str(repo))
    return str(repo)


def test_enumerate_repo_with_hints(spark, origin, tmp_path):
    df = enumerate_repo(spark, origin, str(tmp_path / "work"))
    rows = {r.rel_path: r for r in df.collect()}
    assert set(rows) == {"README.md", "main.py", "docs/guide.md", "binary.dat"}
    r = rows["main.py"]
    assert r.source_type == "git"
    assert len(r.change_hint) == 40  # blob SHA hex
    assert bytes(r.content) == b"print('v1')"


def test_glob_include_exclude(spark, origin, tmp_path):
    only_md = enumerate_repo(
        spark, origin, str(tmp_path / "w1"), include_globs=("*.md", "docs/*")
    )
    assert {r.rel_path for r in only_md.collect()} == {"README.md", "docs/guide.md"}
    no_docs = enumerate_repo(
        spark, origin, str(tmp_path / "w2"), exclude_globs=("docs/*", "*.dat")
    )
    assert {r.rel_path for r in no_docs.collect()} == {"README.md", "main.py"}


def test_refetch_and_change_detection(spark, origin, tmp_path):
    work = str(tmp_path / "w3")
    first = enumerate_repo(spark, origin, work)
    catalog = first.select("rel_path", "change_hint")
    # amend the origin: one file changes, one is new
    import pathlib

    repo = pathlib.Path(origin)
    (repo / "main.py").write_text("print('v2')")
    (repo / "new.txt").write_text("fresh")
    _git(["add", "-A"], origin)
    _git(["commit", "-q", "-m", "v2"], origin)

    second = enumerate_repo(spark, origin, work)  # fetch+reset path
    delta = {r.rel_path for r in changed_files(second, catalog).collect()}
    assert delta == {"main.py", "new.txt"}


def test_clone_or_fetch_idempotent(origin, tmp_path):
    w = str(tmp_path / "w4")
    p1 = clone_or_fetch(origin, w)
    p2 = clone_or_fetch(origin, w)
    assert p1 == p2


def test_blob_manifest_handles_non_ascii_paths(spark, tmp_path):
    """r13 formula review: ls-tree without -z C-quotes special-char
    paths ("caf\\303\\251.md"), which can never equi-join the scan's
    rel_path — the file would re-ingest as 'added' on every sync."""
    import subprocess

    repo = str(tmp_path / "repo")
    os.makedirs(repo)

    def g(*args):
        subprocess.run(["git", "-c", "user.email=t@e.c", "-c", "user.name=t",
                        "-c", "core.autocrlf=false", *args],
                       cwd=repo, check=True, capture_output=True)

    g("init", "-q")
    with open(os.path.join(repo, "café résumé.md"), "w", encoding="utf-8") as f:
        f.write("non-ascii path")
    g("add", "-A")
    g("commit", "-q", "-m", "c")
    from semantik_spark.sources.git import blob_manifest, enumerate_repo

    man = {r["rel_path"]: r["blob_sha"] for r in blob_manifest(spark, repo).collect()}
    assert "café résumé.md" in man and len(man["café résumé.md"]) == 40
    out = enumerate_repo(spark, repo, str(tmp_path / "work")).collect()
    hints = {r["rel_path"]: r["change_hint"] for r in out}
    assert hints.get("café résumé.md") == man["café résumé.md"]


def test_crashed_partial_clone_recovers_and_change_hints_stay_exact(spark, tmp_path):
    """VERDICT r12 item 5: a sync killed mid-clone leaves the workdir
    checkout WITHOUT .git — `git clone` into a non-empty dir fails
    permanently, so before the r13 fix every retry failed too. The
    retry must re-clone cleanly, and the blob-SHA change-hint anti-join
    must keep re-ingestion exactly-once across the crash."""
    repo = str(tmp_path / "origin")
    os.makedirs(repo)

    def g(*args):
        subprocess.run(["git", "-c", "user.email=t@e.c", "-c", "user.name=t",
                        "-c", "core.autocrlf=false", *args],
                       cwd=repo, check=True, capture_output=True)

    g("init", "-q")
    for n in ("a.txt", "b.txt"):
        with open(os.path.join(repo, n), "w") as f:
            f.write(f"content {n}")
    g("add", "-A")
    g("commit", "-q", "-m", "A")

    workdir = str(tmp_path / "work")
    # simulate the killed clone: dest exists, partial payload, no .git
    import re as _re

    dest = os.path.join(workdir, _re.sub(r"[^A-Za-z0-9_.-]", "_", repo))
    os.makedirs(dest)
    with open(os.path.join(dest, "a.txt"), "w") as f:
        f.write("partial torn write")

    first = enumerate_repo(spark, repo, workdir)
    cat = first.select("rel_path", "change_hint").collect()
    assert {r["rel_path"] for r in cat} == {"a.txt", "b.txt"}
    assert all(len(r["change_hint"]) == 40 for r in cat)

    # second sync after one file changes: change detection must emit
    # exactly the changed file, once — nothing re-ingested from the
    # crash recovery
    with open(os.path.join(repo, "b.txt"), "w") as f:
        f.write("content b.txt v2")
    g("add", "-A")
    g("commit", "-q", "-m", "B")
    second = enumerate_repo(spark, repo, workdir)
    delta = changed_files(second, first.select("rel_path", "change_hint"))
    rows = [r["rel_path"] for r in delta.collect()]
    assert rows == ["b.txt"], rows
