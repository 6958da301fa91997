"""data_quality_monitoring_spark — a PySpark-native web-scale quality-filter engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
``xafron-bv/data-quality-monitoring`` system, re-expressed as an idiomatic
Spark DataFrame pipeline for Common-Crawl-style web pages:

* rule-based validation engine        (operators/rules.py)
* pattern/dictionary detector         (operators/patterns.py)
* hashed-n-gram language ID           (operators/langid.py)
* n-gram pseudo-perplexity scorer     (operators/perplexity.py)
* PII/toxicity regex scrubber         (operators/scrub.py)
* priority / weighted verdicts        (operators/verdict.py)
* deterministic error injection       (operators/injection.py)
* confusion-matrix metrics + curves   (operators/metrics.py)
* column profiling                    (operators/profile.py)
* dedup (exact/minhash/simhash/...)   (operators/dedup.py)
* embedding similarity search         (operators/similarity.py)
* text statistics / quality scoring   (operators/textstats.py)
* end-to-end resumable pipeline       (plans/pipeline.py)

Design doctrine: declare the logical plan with DataFrame expressions and let
Catalyst/Tungsten pick the physical strategy; drop to Arrow-batched pandas
UDFs only where Python-regex parity or model scoring genuinely requires it.
"""

__version__ = "0.1.0"
