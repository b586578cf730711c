"""Incremental-dedup signature index — the daily-crawl loop's engine
(r8; moved from ``scripts/ingest_increment.py`` into the package in
r11 — ADVICE r10: library code lived under ``scripts/``, so
``streaming/ingest.py`` only worked with the repo root on
``sys.path`` and broke if the package was installed without
``scripts/``; the CLI is now a thin wrapper over this module).

Each :func:`run` takes a NEW batch of documents plus a persistent
STATE directory (the MinHash signature index + pointers to
previously ingested batches) and emits:

- ``matches/``   (new_id, match_id, from_base, jaccard) — every
  verified near-duplicate relationship the new batch has against the
  existing corpus (``from_base=true``) or within itself
  (``from_base=false``, pointing at the smaller new id);
- ``survivors/`` — the new-batch docs with no match (the rows a
  training pipeline keeps);
- an updated state: the new batch's signatures are APPENDED to the
  index and the batch path recorded, so the next increment's
  candidate generation reads k ints/doc from parquet instead of
  re-hashing the whole corpus text
  (operators/dedup.py:incremental_near_dups ``base_sig=``).

ALL new docs' signatures enter the index — including dropped
duplicates — because a future doc duplicating a DROPPED doc must
still be flagged; this is exactly what makes the union of N
incremental runs consistent with one full-corpus
``minhash_near_dups`` pass (pinned by
tests/test_extensions.py::test_ingest_increment_cli_equals_full_pass).

Base TEXT is read only through the recorded batch paths and only for
docs that actually collide (the operator's semi-join pruning), so a
steady-state increment touches: new text once, the int-only
signature index, and the colliding slice of old batches.

State layout under ``state_dir``::

    signatures/   (id, m0..m{k-1}) parquet — appended per run
    meta.json     {params (incl. hash_family), batches: [paths],
                   n_docs}
    .writer.lock  present only while a writer holds the lease

Single-writer lease (r10): every increment and compaction holds an
exclusive lock on the state dir for its duration
(operators/statelock.py) — a concurrent run is refused loudly
instead of interleaving appends with a directory swap; a crashed
writer's lock ages out (the holder heartbeats, so only a DEAD
writer's lock qualifies — r11). ``params.hash_family`` (r10) pins
the MinHash construction the signatures were built with: state from
a different family (e.g. the pre-r9 un-reduced one, whose signatures
never collide with current ones) is REJECTED instead of silently
yielding zero base matches; legacy sidecars without the field pass
a value-domain backstop (current family is mod 2^31-1, so any
stored m-value >= 2^31 proves the old family) and are stamped.

Write order per run is: outputs, then signature append, then
meta.json last — a crash before meta leaves stray signature files
for ids meta doesn't know about. Rerunning an already-COMPLETED
batch (its path recorded in meta) is REJECTED up front (r9) —
it would double-record the path and double-count the corpus.
Rerunning the crashed batch is SAFE, by two mechanisms: (a) the
stray copies of the batch's OWN signatures are anti-joined out of
``base_sig`` before candidate generation (without this every new doc
would pair with its stray self at jaccard 1.0 and the survivors
output would be empty); (b) stray duplicates of OTHER ids (multiple
crashes) only produce duplicate banding rows, which candidate
generation collapses behind its ``.distinct()``
(operators/dedup.py:incremental_near_dups). Colliding docs' text is
read from the batch paths meta records, so the rerun's OUTPUTS equal
a clean run's (effective idempotence), at the cost of dead rows in
``signatures/`` until :func:`compact_signature_index` rewrites them
away (r9 — also bounds the one-file-set-per-increment small-files
growth).

Reference scope: the reference records incremental INTENT
(`/root/reference/` ``state/state.json``, never implemented —
SURVEY.md §4); this is that intent, Spark-native, over the dedup
extension surface.
"""

from __future__ import annotations

import json
import os

_META = "meta.json"
_DEFAULTS = {"n_shingle": 3, "k": 16, "bands": 4}


def run(
    spark,
    new_batch: str,
    state_dir: str,
    out_dir: str,
    threshold: float = 0.8,
) -> dict:
    """One increment. Returns the manifest dict (also what the CLI
    prints). Holds the state directory's single-writer lease for the
    whole increment (r10 — VERDICT r9 #1): a concurrent increment or
    compaction against the same state dir is refused loudly instead
    of interleaving signature appends with a compaction's
    directory swap (operators/statelock.py)."""
    from etl_macropulse_br_spark.operators.statelock import writer_lock

    with writer_lock(state_dir, owner="signature_index.run") as lease:
        return _run_unlocked(
            spark, new_batch, state_dir, out_dir, threshold, lease=lease
        )


def _run_unlocked(
    spark,
    new_batch: str,
    state_dir: str,
    out_dir: str,
    threshold: float = 0.8,
    lease=None,
) -> dict:
    import functools

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from etl_macropulse_br_spark.functions.hashing import MINHASH_FAMILY
    from etl_macropulse_br_spark.operators.dedup import (
        incremental_near_dups,
        minhash_near_dups,
        minhash_signature_table,
    )

    meta_path = os.path.join(state_dir, _META)
    sig_dir = os.path.join(state_dir, "signatures")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    else:
        meta = {
            "params": {**_DEFAULTS, "hash_family": MINHASH_FAMILY},
            "batches": [],
            "n_docs": 0,
        }
    p = meta["params"]

    # r10 (ADVICE r9 #1): signatures are only comparable when built
    # by the SAME hash family — the r9 Carter-Wegman fix changed
    # every signature value, so an index written under the old
    # family would band-collide with nothing and every increment
    # would silently report zero base matches. The family id is
    # stamped into the sidecar on first write and mismatches are
    # rejected. A legacy sidecar without the field gets the cheap
    # value-domain backstop: the current family is mod 2^31-1, so
    # any stored m-column value >= 2^31 proves a pre-fix index.
    fam = p.get("hash_family")
    if fam is not None and fam != MINHASH_FAMILY:
        raise ValueError(
            f"signature_index: state at {state_dir!r} was built with "
            f"hash family {fam!r}; this engine uses "
            f"{MINHASH_FAMILY!r} — its signatures would never match. "
            "Rebuild the index from the recorded batch parquet."
        )
    if fam is None and meta["batches"]:
        from pyspark.sql import functions as _F

        sig_probe = spark.read.parquet(sig_dir)
        mcols = [c for c in sig_probe.columns if c.startswith("m")]
        row = sig_probe.agg(
            *[_F.max(c).alias(c) for c in mcols]
        ).first()
        if any(row[c] is not None and row[c] >= (1 << 31) for c in mcols):
            raise ValueError(
                f"signature_index: state at {state_dir!r} carries "
                "signature values >= 2^31 — built by the pre-r9 "
                "(degenerate, un-reduced) hash family; they would "
                f"never match {MINHASH_FAMILY!r} signatures. Rebuild "
                "the index from the recorded batch parquet."
            )
        # value domain consistent with the current family: stamp it
        # so future loads skip the probe scan
        p["hash_family"] = MINHASH_FAMILY

    # r9 guard (ADVICE r8 #3), mirroring append_ann_index's
    # duplicate-id rejection: a rerun of an already-COMPLETED batch
    # (meta written) would record the path twice, double-count
    # n_docs, and union duplicate base text into every later
    # increment. Only the crashed-before-meta rerun (handled by the
    # stray-self anti-join below) is a legitimate retry.
    if os.path.abspath(new_batch) in meta["batches"]:
        raise ValueError(
            f"signature_index: batch {new_batch!r} is already "
            "recorded in meta.json — this increment COMPLETED; "
            "rerunning it would duplicate its corpus rows. If the "
            "prior run crashed before writing meta, the path would "
            "not be recorded and the rerun would be safe."
        )

    new_df = spark.read.parquet(new_batch).select("doc_id", "text")

    if meta["batches"]:
        base_df = functools.reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(b).select("doc_id", "text")
                for b in meta["batches"]
            ],
        )
        # crash recovery: a run that died between the signature
        # append and the meta write left THIS batch's signatures in
        # the index; treating them as base would pair every new doc
        # with itself (jaccard 1.0 — survivors emptied). The base is
        # by definition "ids not in the new batch": anti-join them
        # out (int-only, semi-join-sized).
        base_sig = spark.read.parquet(sig_dir).join(
            new_df.select(F.col("doc_id").alias("id")),
            "id",
            "left_anti",
        )
        matches = incremental_near_dups(
            new_df,
            base_df,
            threshold=threshold,
            n_shingle=p["n_shingle"],
            k=p["k"],
            bands=p["bands"],
            base_sig=base_sig,
        )
    else:
        # bootstrap: no base yet — a within-batch pass, reoriented to
        # the incremental contract (loser = larger id, keep-first)
        pairs = minhash_near_dups(
            new_df,
            threshold=threshold,
            n_shingle=p["n_shingle"],
            k=p["k"],
            bands=p["bands"],
            persist_candidates=False,
        )
        matches = pairs.select(
            F.greatest("id_a", "id_b").alias("new_id"),
            F.least("id_a", "id_b").alias("match_id"),
            F.lit(False).alias("from_base"),
            "jaccard",
        )

    matches.write.mode("overwrite").parquet(f"{out_dir}/matches")
    matches = spark.read.parquet(f"{out_dir}/matches")
    survivors = new_df.join(
        matches.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    survivors.write.mode("overwrite").parquet(f"{out_dir}/survivors")

    # state update: ALL new docs' signatures enter the index (see
    # module docstring), then meta last
    minhash_signature_table(
        new_df, n_shingle=p["n_shingle"], k=p["k"]
    ).write.mode("append").parquet(sig_dir)
    n_new = new_df.count()
    n_matches = matches.count()
    n_survivors = spark.read.parquet(f"{out_dir}/survivors").count()
    meta["batches"].append(os.path.abspath(new_batch))
    meta["n_docs"] += n_new
    os.makedirs(state_dir, exist_ok=True)
    # displacement gate (r13): if the lease was stolen mid-increment
    # (heartbeat found a foreign lock), do NOT commit meta — the
    # appended signatures are the documented stray-selfsig shape the
    # next rerun tolerates, and the new holder owns the dir
    if lease is not None:
        lease.check()
    with open(meta_path, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)

    return {
        "new_batch": new_batch,
        "state_dir": state_dir,
        "out": out_dir,
        "threshold": threshold,
        "n_new_docs": n_new,
        "n_matches": n_matches,
        "n_survivors": n_survivors,
        "n_corpus_docs": meta["n_docs"],
        "n_prior_batches": len(meta["batches"]) - 1,
    }


def compact_signature_index(
    spark, state_dir: str, target_files: int | None = None
) -> dict:
    """Rewrite ``signatures/`` into a bounded file count and drop the
    dead rows crash-reruns leave behind (r9 — the module docstring's
    "until a rewrite compacts them"): per-run appends accumulate one
    parquet file set per increment (the small-files trap at scale),
    and a rerun after a crash appends a second identical copy of the
    batch's signatures. Signatures are DETERMINISTIC per id (same
    text, same family), so ``dropDuplicates(id)`` is exact — every
    surviving row is bit-identical to what candidate generation read
    before.

    Swap protocol (plain directories have no atomic rename-over):
    write the compacted table to a uniquely-named sibling, rename
    ``signatures`` away, rename the sibling in, delete the old. A
    crash between the renames leaves NO ``signatures/`` directory —
    the next increment fails LOUDLY on the missing path (never a
    silent partial index); recovery is renaming the stranded
    ``signatures.old-*`` / ``signatures.compact-*`` directory back.
    Single-writer contract, ENFORCED since r10 by the same
    state-dir lease the increments hold — a compaction racing an
    in-flight increment is refused loudly."""
    from etl_macropulse_br_spark.operators.statelock import writer_lock

    with writer_lock(state_dir, owner="compact_signature_index") as lease:
        return _compact_signature_index_unlocked(
            spark, state_dir, target_files, lease=lease
        )


def _compact_signature_index_unlocked(
    spark, state_dir: str, target_files: int | None = None, lease=None
) -> dict:
    import glob
    import shutil
    import uuid

    sig_dir = os.path.join(state_dir, "signatures")
    # r14 (ADVICE r13 #2): when the LIVE ``signatures/`` directory
    # exists, any stranded ``signatures.compact-*`` /
    # ``signatures.old-*`` sibling is a dead orphan from a crashed
    # or displaced compaction (old-*: a crash between the second
    # swap rename and the rmtree) — we hold the state-dir lease, so
    # prune them here instead of letting repeated crashes accumulate
    # dead parquet. When ``signatures/`` is MISSING (a crash landed
    # between the two swap renames), the stranded directory is the
    # documented recovery artifact and the read below fails loudly
    # without touching it.
    #
    # Displacement-gated per deletion (r14 self-review; r15 — ADVICE
    # r14 #4): the prune must be as guarded as the commit — a
    # displaced zombie resuming here would otherwise glob-delete the
    # NEW lease holder's in-flight compact directory and break ITS
    # swap mid-flight. The check runs immediately before EACH rmtree
    # so a displacement landing mid-prune stops the zombie before
    # its next deletion; like the posix provider itself this NARROWS
    # the check→delete window, it cannot close it (no CAS).
    if lease is not None:
        lease.check()
    if os.path.isdir(sig_dir):
        for pat in ("signatures.compact-*", "signatures.old-*"):
            for stale in glob.glob(os.path.join(state_dir, pat)):
                if lease is not None:
                    lease.check()
                shutil.rmtree(stale, ignore_errors=True)
    n = target_files or 1
    before_files = len(
        glob.glob(os.path.join(sig_dir, "**", "*.parquet"), recursive=True)
    )
    before_rows = spark.read.parquet(sig_dir).count()

    tmp = os.path.join(state_dir, f"signatures.compact-{uuid.uuid4().hex[:8]}")
    (
        spark.read.parquet(sig_dir)
        .dropDuplicates(["id"])
        .repartition(n)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    after_rows = spark.read.parquet(tmp).count()
    old = os.path.join(state_dir, f"signatures.old-{uuid.uuid4().hex[:8]}")
    # displacement gate (r13): the directory swap is the compaction's
    # point of no return — a displaced lease must abort BEFORE it,
    # leaving the live signatures untouched. r14 (ADVICE r13 #2): the
    # compacted tmp directory is removed before re-raising — the new
    # lease holder owns the dir and will run its own compaction; an
    # orphan here would otherwise persist forever (and the prune at
    # the top of this function only runs on the next compaction).
    if lease is not None:
        try:
            lease.check()
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    os.rename(sig_dir, old)
    os.rename(tmp, sig_dir)
    shutil.rmtree(old)
    after_files = len(
        glob.glob(os.path.join(sig_dir, "**", "*.parquet"), recursive=True)
    )
    return {
        "state_dir": state_dir,
        "files_before": before_files,
        "files_after": after_files,
        "rows_before": before_rows,
        "rows_after": after_rows,
        "dead_rows_removed": before_rows - after_rows,
    }
