#!/usr/bin/env python3
"""One-shot refactor: split PipelineQueries.scala by family (r7 verdict #8).

Moves the dedup/linkage family and the embedding/ANN family into
PipelineDedupQueries.scala / PipelineSimilarityQueries.scala, keeping
query+oracle pairs together. Pure text surgery on the two Map regions;
entry = preceding contiguous comment block + the "qNN_..." -> ... block.
"""
import re, sys

SRC = "src/main/scala/graft/queries/PipelineQueries.scala"

DEDUP = {
    "q24_dedup_exact", "q25_fingerprint", "q26_jaccard_pairs",
    "q27_minhash_lsh", "q175_sig_dedup", "q28_simhash_pairs",
    "q44_dedup_clusters", "q45_winnow_fp", "q46_winnow_pairs",
    "q47_winnow_clusters", "q48_contamination", "q69_contamination_bloom",
    "q53_dedup_keep", "q68_dedup_passages", "q96_setsim_join",
    "q106_editdist_join", "q141_jw_join", "q159_record_linkage",
    "q179_dedup_spans",
}
SIM = {
    "q29_ann_topk", "q30_lsh_topk", "q41_ivf_topk", "q56_ivfpq_topk",
    "q62_semdedup", "q38_cosine_pairs", "q134_kmeans", "q170_contrastive",
    "q171_embedding_drift", "q176_pq_codec", "q184_kcenter_coreset",
    "q185_jl_project", "q187_label_outliers", "q90_pca",
    "q72_image_dup_pairs",
}

lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit("not found")

q_open = find(lambda l: l.startswith("  def queries"))
o_open = find(lambda l: l.startswith("  def oracleSql"))
# map regions close with a line exactly "  )"
q_close = find(lambda l: l == "  )", q_open)
o_close = find(lambda l: l == "  )", o_open)
assert q_close < o_open < o_close, (q_open, q_close, o_open, o_close)

def split_entries(lo, hi):
    """Return (entries list of (name, [lines])) for region lines[lo:hi]."""
    starts = [i for i in range(lo, hi)
              if re.match(r'^    "q\d+_\w+" ->', lines[i])]
    # attach preceding contiguous comment block (and blank line above it)
    attach = []
    for s in starts:
        a = s
        while a - 1 >= lo and re.match(r"^    //", lines[a - 1]):
            a -= 1
        attach.append(a)
    entries = []
    for j, s in enumerate(starts):
        name = re.match(r'^    "(q\d+_\w+)"', lines[s]).group(1)
        end = attach[j + 1] if j + 1 < len(starts) else hi
        block = lines[attach[j]:end]
        # strip leading/trailing blank lines; re-add separators on emit
        while block and not block[0].strip():
            block.pop(0)
        while block and not block[-1].strip():
            block.pop()
        # ensure trailing comma (scala 2.13 allows trailing comma pre-`)`)
        if not block[-1].rstrip().endswith(","):
            block[-1] = block[-1] + ","
        entries.append((name, block))
    return entries

q_entries = split_entries(q_open + 1, q_close)
o_entries = split_entries(o_open + 1, o_close)

qn = {n for n, _ in q_entries}
on = {n for n, _ in o_entries}
missing = (DEDUP | SIM) - qn
if missing:
    raise SystemExit(f"queries not found: {missing}")
print(f"queries: {len(q_entries)}, oracles: {len(o_entries)}")
print(f"oracle-only names: {on - qn}; query-only: {qn - on}")

def emit(entries, names):
    out = []
    for n, block in entries:
        if n in names:
            out.append("\n".join(block))
    return "\n\n".join(out)

HEADER_COMMON = """package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
"""

# ---- helper blocks to move ----
# fs helpers: lines between 'private val fsMu' and 'private val fsWd' defs
fs_start = find(lambda l: "fsMu" in l and "private val" in l)
fs_block = "\n".join(lines[fs_start - 2:fs_start + 4])  # comment + 4 defs
ann_start = find(lambda l: l.startswith("  /** Invariant-oracle audit"))
ann_end = find(lambda l: l == "  }", ann_start)
ann_block = "\n".join(lines[ann_start:ann_end + 1])

dedup_file = f"""{HEADER_COMMON}import graft.pipeline.Dedup

/** Deduplication / decontamination / record-linkage query surface —
  * the dedup family split out of PipelineQueries (r7 verdict #8):
  * exact, fingerprint, n-gram Jaccard, MinHash-LSH (plain + signature-
  * verified), SimHash, winnowing, cluster resolution, passage dedup,
  * duplicate-span removal, set-similarity join, edit-distance /
  * Jaro-Winkler / Fellegi-Sunter linkage, and eval-set
  * decontamination (exact + Bloom). See each entry's scaladoc for the
  * scale shape; every entry has a DuckDB oracle in [[oracleSql]].
  */
object PipelineDedupQueries {{

{fs_block}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{emit(q_entries, DEDUP)}
  )

  def oracleSql: Map[String, String] = Map(
{emit(o_entries, DEDUP)}
  )
}}
"""

sim_file = f"""{HEADER_COMMON}import graft.pipeline.Similarity

/** Embedding / similarity-search query surface — the ANN family split
  * out of PipelineQueries (r7 verdict #8): the exact-to-IVF-PQ top-k
  * ladder with hash-enforced recall floors, SemDeDup, cosine pair
  * mining, k-means, contrastive mining, drift, PQ codec audit,
  * k-center coreset, JL projection, label outliers, PCA, and the
  * perceptual-hash image dup join. Every entry has a DuckDB oracle in
  * [[oracleSql]].
  */
object PipelineSimilarityQueries {{

{ann_block}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{emit(q_entries, SIM)}
  )

  def oracleSql: Map[String, String] = Map(
{emit(o_entries, SIM)}
  )
}}
"""

keep = qn - DEDUP - SIM
rest_q = emit(q_entries, keep)
rest_o = emit(o_entries, keep)

head = "\n".join(lines[:fs_start - 2])  # up to fs comment block
# between helper end (ann_end) and q_open: whatever remains (blank lines)
rest_file = f"""{head}
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
{rest_q}
  )

  def oracleSql: Map[String, String] = Map(
{rest_o}
  )
}}
"""

open("src/main/scala/graft/queries/PipelineDedupQueries.scala", "w").write(dedup_file)
open("src/main/scala/graft/queries/PipelineSimilarityQueries.scala", "w").write(sim_file)
open(SRC, "w").write(rest_file)
print(f"kept {len(keep)}, dedup {len(DEDUP)}, sim {len(SIM)}")
