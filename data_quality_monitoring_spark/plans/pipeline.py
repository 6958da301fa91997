"""End-to-end quality-filter plan: pages → findings → verdict → scrubbed text.

The reference runs four detector families per field sequentially with manual
process pools and cache-clearing (``comprehensive_detector.py:779-859``);
here the whole thing is ONE ``select`` — four finding structs, a verdict
coalesce and the scrub chain — so Catalyst fuses it into a single
whole-stage-codegen'd map stage with two pandas-UDF hops (langid,
perplexity).  No shuffle anywhere in the hot path: the plan is
embarrassingly parallel and scales linearly with executors, which is what
the N→4N ≥0.8 scaling-efficiency target needs.

Skew note: scoring is a narrow map so host skew cannot hurt it; skew only
matters for the host-level metric aggregations, which go through
``salted_group_count`` (salt = pmod(xxhash64(url), K)) before the final
combine — the classic two-phase aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..artifacts import get_bigram_models, get_langid_model
from ..operators import langid as L
from ..operators import perplexity as P
from ..operators.patterns import pattern_finding
from ..operators.rules import all_findings, first_hit
from ..operators.scrub import scrub_column
from ..operators.verdict import priority_verdict, weighted_verdict

def default_rules() -> list[dict]:
    # zip-safe: the package may live inside a --py-files zip (resources.py)
    from ..resources import read_package_json

    return read_package_json("rulesets", "text_quality.json")["rules"]


def default_pattern_cfg() -> dict:
    from ..resources import read_package_json

    return read_package_json("rulesets", "lang_pattern.json")


def quality_filter(
    spark: SparkSession,
    pages: DataFrame,
    rules: list[dict] | None = None,
    pattern_cfg: dict | None = None,
    combine: str = "priority",
    ml_threshold: float = 0.7,
    llm_threshold: float = 6.0,
    mlq_threshold: float = 0.5,
    thresholds: dict[str, float] | None = None,
    regex_engine: str = "auto",
    with_all_findings: bool = False,
    methods: list[str] | None = None,
    langid_model=None,
    bigram_models=None,
    cascade: bool = False,
    llm_tiers: dict | None = None,
) -> DataFrame:
    """Attach findings, verdict, keep flag and scrubbed text to a pages df.

    Output columns: url, warc_ts, lang, text, validation/pattern/ml/llm
    finding structs, verdict struct, keep boolean, text_scrubbed.

    ``methods`` prunes detector families before the plan is built — the
    reference's capability probing (``comprehensive_detector.py:222-260``)
    as plan pruning: a disabled model scorer never even adds its pandas-UDF
    stage.

    ``langid_model`` / ``bigram_models`` override the frozen artifacts —
    used by the fully-oracled flagship contract query, which injects
    SQL-reproducible in-query-trained models through the SAME plan.

    ``cascade=True`` skips the model scorers for documents the rule chain
    already condemns: a validation finding drops the document
    deterministically under BOTH combiners (priority puts validation
    first; weighted lets validation win outright), so masking the scorer
    input to NULL for those rows cannot change any keep/drop decision —
    it only leaves their score columns NULL (tested).  The mask stays a
    Column expression inside the same narrow stage — no join, no shuffle,
    the 0-Exchange plan is preserved — but the Arrow scorers now do zero
    Python work for condemned rows.  At web scale, where 30–60% of raw
    pages die on cheap rules and real model scorers dominate cost (the
    reference's LLM family is ~100–500 ms/record vs <1 ms for rules),
    this is the difference between scoring the crawl and scoring the
    corpus.  Off by default: the reference computes every family for
    every row.

    ``llm_tiers`` turns on the reference's optional LLM-detector tiers
    (llm_anomaly_detector.py:264-266, off by default there too; see
    operators/llm_tiers.py for the exact semantics).  Keys:
    ``temporal_col`` / ``context_cols`` (dynamic encoding, score × 1.1
    when a context is present), ``prototype`` (bool, score × 1.05),
    ``fewshot_examples`` (list[str], in-context short-circuit) and
    ``icl_threshold`` (default 0.7).
    """
    rules = rules if rules is not None else default_rules()
    pattern_cfg = pattern_cfg if pattern_cfg is not None else default_pattern_cfg()
    methods = methods if methods is not None else ["validation", "pattern", "ml", "llm"]

    text, lang = F.col("text"), F.col("lang")
    cols: dict[str, Column] = {}
    model_text = text
    base = pages
    if "validation" in methods:
        if cascade:
            # stage 0: rules first, so the scorer mask can reference them
            base = pages.withColumn(
                "f_validation", first_hit(text, rules, regex_engine)
            )
            model_text = F.when(F.col("f_validation").isNull(), text)
        else:
            cols["f_validation"] = first_hit(text, rules, regex_engine)
    if "pattern" in methods:
        cols["f_pattern"] = pattern_finding(lang, pattern_cfg)
    if "ml" in methods:
        cols["langid"] = L.langid_struct(
            spark,
            langid_model if langid_model is not None else get_langid_model(),
            model_text,
            lang,
        )
    if "llm" in methods:
        cols["ppl_score"] = P.perplexity_column(
            spark,
            bigram_models if bigram_models is not None else get_bigram_models(),
            model_text,
            lang,
        )
    if "quality_model" in methods:  # opt-in learned quality tier
        from ..artifacts import get_quality_model
        from ..operators import quality_model as QM

        cols["mlq_score"] = QM.quality_prob(spark, get_quality_model(), model_text)
    df = base.withColumns(cols)
    stage2: dict[str, Column] = {}
    if "ml" in methods:
        stage2["f_ml"] = L.langid_finding(F.col("langid"), ml_threshold)
    if "llm" in methods:
        if llm_tiers:
            from ..operators import llm_tiers as LT

            dyn = None
            if llm_tiers.get("temporal_col") or llm_tiers.get("context_cols"):
                dyn = LT.dynamic_context_flag(
                    temporal=(
                        F.col(llm_tiers["temporal_col"])
                        if llm_tiers.get("temporal_col")
                        else None
                    ),
                    context_cols=[
                        F.col(c) for c in llm_tiers.get("context_cols", [])
                    ],
                )
            enh = LT.enhanced_score(
                F.col("ppl_score"),
                dynamic=dyn,
                prototype=bool(llm_tiers.get("prototype")),
            )
            sim = (
                LT.fewshot_max_cosine(
                    spark, list(llm_tiers["fewshot_examples"]), model_text
                )
                if llm_tiers.get("fewshot_examples")
                else None
            )
            stage2["f_llm"] = LT.llm_tier_finding(
                enh,
                llm_threshold,
                icl_sim=sim,
                icl_threshold=float(llm_tiers.get("icl_threshold", 0.7)),
            )
        else:
            stage2["f_llm"] = P.perplexity_finding(F.col("ppl_score"), llm_threshold)
    if "quality_model" in methods:
        from ..operators import quality_model as QM

        stage2["f_quality_model"] = QM.quality_model_finding(
            F.col("mlq_score"), mlq_threshold
        )
    if stage2:
        df = df.withColumns(stage2)
    findings: dict[str, Column] = {
        m: F.col(f"f_{m}")
        for m in ("validation", "pattern", "ml", "llm", "quality_model")
        if m in methods
    }
    verdict = (
        priority_verdict(findings, thresholds)
        if combine == "priority"
        else weighted_verdict(findings, thresholds=thresholds)
    )
    df = df.withColumns(
        {
            "verdict": verdict,
            "keep": verdict.isNull(),
            "text_scrubbed": scrub_column(text),
        }
    )
    if with_all_findings:
        df = df.withColumn("findings_all", all_findings(text, rules, regex_engine))
    return df


def filtered_output(result: DataFrame) -> DataFrame:
    """The kept slice a downstream trainer would read."""
    return result.filter(F.col("keep")).select("url", "warc_ts", "lang", "text_scrubbed")


def salted_group_count(df: DataFrame, key: Column, n_salt: int = 16) -> DataFrame:
    """Two-phase (salted) count for skewed keys, e.g. pages per host.

    Phase 1 aggregates (key, salt) — splitting each hot key across n_salt
    reducers — phase 2 combines the partials.  With AQE skew handling ON this
    is a belt-and-braces guarantee rather than the only defence.
    """
    salted = df.groupBy(key.alias("k"), F.pmod(F.xxhash64(F.col("url")), F.lit(n_salt)).alias("_salt")).count()
    return salted.groupBy("k").agg(F.sum("count").alias("n")).withColumnRenamed("k", "key")


def filter_metrics(
    result: DataFrame, group_cols: tuple[str, ...] = ()
) -> dict[str, DataFrame]:
    """The north star's filter-metrics tables from one pipeline result:
    per-rule fire counts, langid distribution, perplexity histogram.

    Each is a small aggregate over the already-computed result columns —
    at 100 TB they are map-side-combined groupBys whose outputs are a few
    hundred rows.  With ``group_cols=("bucket",)`` the tables are keyed by
    the resumable sink's commit bucket, so ``PartitionedSink.run(...,
    metrics_fn=...)`` checkpoints them per partition alongside lineage and
    a resumed run appends exactly the missing buckets' rows."""
    from ..operators.metrics import histogram, rule_fire_counts

    out: dict[str, DataFrame] = {
        "rule_fires": rule_fire_counts(result, group_cols=group_cols)
    }
    cols = set(result.columns)
    if "langid" in cols:
        out["lang_dist"] = (
            result.groupBy(
                *group_cols,
                F.coalesce(F.col("langid")["pred_lang"], F.lit("unknown")).alias("lang"),
            ).agg(F.count("*").alias("n"))
        )
    if "ppl_score" in cols:
        out["ppl_hist"] = histogram(
            result, "ppl_score", 0.0, 10.0, n_buckets=20, group_cols=group_cols,
            # always "bin": a mode-dependent name (it must not shadow the
            # sink's commit bucket in grouped mode) would let a consumer
            # silently aggregate over the wrong dimension
            bucket_col="bin",
        )
    return out


def run_manifest(result: DataFrame) -> dict:
    """Small driver-side run summary (reference run-summary dict,
    comprehensive_detector.py:841-859)."""
    agg = result.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).collect()[0]
    return {"docs": agg["docs"], "kept": agg["kept"], "dropped": agg["docs"] - agg["kept"]}
