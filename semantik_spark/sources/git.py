"""Git repository connector (S2).

Reference parity (shared/connectors/git.py:33-771):
  clone/fetch  :471-555  shallow clone at a ref, re-fetch on re-sync
  globs        :556-584  include/exclude fnmatch patterns
  change_hint  :585-604  per-file blob SHA (skip unchanged files
                         without re-reading content)

Spark-first split: the clone is inherently driver-side (one repo, git
CLI); everything after is distributed — a `binaryFile` scan over the
working tree (sources.local.enumerate_files, so listing/filter/load is
one distributed read) joined with the blob-SHA manifest from
`git ls-tree -r` (tiny: one row per tracked file → broadcast join).
The blob SHA is git's content address, so change detection (J4) can
anti-join on it WITHOUT hashing file bytes — cheaper than content_hash
for unchanged files, exactly why the reference uses it.
"""

from __future__ import annotations

import fnmatch
import os
import re
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semantik_spark.sources.local import enumerate_files


class GitConnectorError(RuntimeError):
    pass


def _run_git(args: list[str], cwd: str | None = None) -> str:
    # -c core.autocrlf=false: working-tree bytes must equal blob bytes
    # regardless of the host's global gitconfig — a CRLF-converting
    # config would make size_bytes/content_hash environment-dependent
    proc = subprocess.run(
        ["git", "-c", "core.autocrlf=false", *args],
        cwd=cwd, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise GitConnectorError(f"git {' '.join(args)} failed: {proc.stderr.strip()}")
    return proc.stdout


def clone_or_fetch(repo_url: str, workdir: str, ref: str | None = None,
                   depth: int = 1) -> str:
    """Shallow clone `repo_url` at `ref` into workdir (or fetch+reset if
    already cloned) — git.py:471-555. Returns the checkout path."""
    dest = os.path.join(workdir, re.sub(r"[^A-Za-z0-9_.-]", "_", repo_url))
    if os.path.isdir(os.path.join(dest, ".git")):
        _run_git(["fetch", "--depth", str(depth), "origin"], cwd=dest)
        target = ref or "origin/HEAD"
        _run_git(["reset", "--hard", target if ref is None else f"origin/{ref}"],
                 cwd=dest)
    else:
        # crash recovery (r13; reference re-clone semantics
        # git.py:471-555): a sync killed mid-clone leaves dest without
        # .git — `git clone` into a non-empty dir fails PERMANENTLY, so
        # every retry of the sync would fail too. Remove the partial
        # checkout and re-clone; the blob-SHA change_hint anti-join
        # downstream keeps re-ingestion exactly-once regardless.
        if os.path.isdir(dest):
            import shutil

            shutil.rmtree(dest)
        args = ["clone", "--depth", str(depth)]
        if ref:
            args += ["--branch", ref]
        _run_git([*args, repo_url, dest])
    return dest


def blob_manifest(spark: SparkSession, checkout: str) -> DataFrame:
    """rel_path, blob_sha for every tracked file at HEAD (ls-tree -r) —
    the change_hint source (git.py:585-604). Driver-side git call; the
    output is one row per file and becomes a broadcastable DataFrame.

    ``-z`` is load-bearing (r13 formula review): without it git C-quotes
    any path with non-ASCII/special characters (``"caf\\303\\251.md"``),
    which can never equi-join the scan's rel_path — the file would get
    a NULL change_hint and be re-ingested as "added" on EVERY sync."""
    out = _run_git(["ls-tree", "-r", "-z", "HEAD"], cwd=checkout)
    rows = []
    for line in out.split("\0"):
        # "<mode> blob <sha>\t<path>"
        if not line:
            continue
        meta, path = line.split("\t", 1)
        mode, kind, sha = meta.split()
        if kind == "blob":
            rows.append((path, sha))
    return spark.createDataFrame(rows or [("", "")], ["rel_path", "blob_sha"]).where(
        F.col("rel_path") != ""
    )


def enumerate_repo(spark: SparkSession, repo_url: str, workdir: str,
                   ref: str | None = None,
                   include_globs: tuple[str, ...] = (),
                   exclude_globs: tuple[str, ...] = (),
                   extensions: tuple[str, ...] = ()) -> DataFrame:
    """Clone + enumerate: FileReference rows (the sources.local contract)
    plus rel_path, change_hint (blob SHA), source_type='git'.

    Globs evaluate against the repo-relative path (git.py:556-584). The
    glob→regex translation happens once on the driver; the filter itself
    is a Column predicate pushed into the scan.
    """
    checkout = clone_or_fetch(repo_url, workdir, ref=ref)
    files = enumerate_files(
        spark, checkout,
        extensions=extensions or (),  # repo connector defaults to all tracked files
    )
    prefix_len = len(checkout.rstrip("/")) + 1
    files = files.withColumn(
        "rel_path",
        F.expr(f"substring(regexp_replace(uri, '^file:/+', '/'), {prefix_len + 1})"),
    )
    if include_globs or exclude_globs:
        # fnmatch.translate emits `(?s:...)\Z` — valid Java regex as-is;
        # anchor the front so rlike's substring match becomes full-match.
        keep = F.lit(True)
        if include_globs:
            inc = F.lit(False)
            for g in include_globs:
                inc = inc | F.col("rel_path").rlike("^" + fnmatch.translate(g))
            keep = keep & inc
        for g in exclude_globs:
            keep = keep & ~F.col("rel_path").rlike("^" + fnmatch.translate(g))
        files = files.where(keep)
    manifest = blob_manifest(spark, checkout)
    return (
        files.join(F.broadcast(manifest), "rel_path", "left")
        .withColumn("change_hint", F.col("blob_sha"))
        .withColumn("source_type", F.lit("git"))
        .drop("blob_sha")
    )


def changed_files(new_enum: DataFrame, catalog: DataFrame) -> DataFrame:
    """J4 change-detection specialized to git: keep rows whose
    (rel_path, change_hint) is new or differs from the catalog — an
    anti-join on the blob SHA, no content hashing needed."""
    return new_enum.join(
        catalog.select("rel_path", F.col("change_hint").alias("_old_hint")),
        "rel_path", "left",
    ).where(
        F.col("_old_hint").isNull() | (F.col("_old_hint") != F.col("change_hint"))
    ).drop("_old_hint")
