"""Verbatim r13 (pre-r14-optimization) implementations, kept for
interleaved A/B runs and plan captures. Copied from git HEAD e7ef58b-era
code; see tools/exp_r14_ab.py and tools/capture_plans_r14.py."""
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline import dedup


def _move_round_old(self, adj, nodes, m, rnd, ckpt, shuffle_n):
    """r13 HEAD _move_round (two-exchange shape) — verbatim copy."""
    tot = nodes.groupBy("comm").agg(F.sum("k").alias("tot"))
    ntot = nodes.join(tot, "comm")
    nbrc = (
        adj.join(
            ntot.select(
                F.col("v").alias("u"),
                F.col("comm").alias("uc"),
                F.col("tot").alias("tot_c"),
            ),
            "u",
        )
        .groupBy("v", "uc")
        .agg(F.sum("w").alias("kvc"), F.max("tot_c").alias("tot_c"))
    )
    enriched = nbrc.join(
        ntot.select("v", "comm", "k", F.col("tot").alias("tot_own")), "v"
    )
    own = enriched.filter(F.col("uc") == F.col("comm")).select(
        "v", F.col("kvc").alias("kv_own")
    )
    cand = enriched.filter(F.col("uc") != F.col("comm")).join(own, "v", "left")
    gain = (
        (F.col("kvc") - F.coalesce(F.col("kv_own"), F.lit(0.0))) / F.lit(m)
        - F.col("k")
        * (F.col("tot_c") - F.col("tot_own") + F.col("k"))
        / F.lit(2.0 * m * m)
    )
    best = cand.groupBy("v").agg(
        F.max(F.struct(gain.alias("g"), (-F.col("uc")).alias("negc"))).alias("b")
    )
    parity_ok = F.pmod(F.xxhash64(F.col("v"), F.lit(rnd)), F.lit(2)) == 0
    wants = best.filter(F.col("b.g") > 1e-12).select(
        "v", (-F.col("b.negc")).alias("__to"), parity_ok.alias("__go")
    )
    from pyspark.sql import Observation

    obs = Observation()
    new_nodes = ckpt.push_bucketed(
        nodes.join(wants, "v", "left")
        .select(
            "v",
            F.when(F.col("__go"), F.col("__to"))
            .otherwise(F.col("comm"))
            .alias("comm"),
            "k",
            F.col("__to").isNotNull().alias("__want"),
        )
        .observe(obs, F.sum(F.col("__want").cast("int")).alias("wanted"))
        .drop("__want"),
        "v",
        shuffle_n,
        f"nodes_r{rnd}",
        assume_partitioned=True,
    )
    ckpt.evict_all_but_latest(1)
    return int(obs.get["wanted"] or 0), new_nodes


_jaccard_new = dedup.ngram_jaccard_pairs


def _jaccard_old(docs, text_col="text", n=3, threshold=0.5,
                 max_doc_freq=dedup.DEFAULT_MAX_DOC_FREQ):
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col(text_col), n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    postings = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    ).filter(F.size("ds") > 1)
    if max_doc_freq is not None:
        postings = postings.filter(F.size("ds") <= max_doc_freq)
    common = (
        postings.select(F.posexplode("ds").alias("i", "doc_a"), F.col("ds"))
        .select(
            "doc_a",
            F.explode(F.slice("ds", F.col("i") + 2, F.size("ds"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


