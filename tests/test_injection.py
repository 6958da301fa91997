"""Injection operator semantics + determinism + the injection-recovery loop
(the reference's core self-evaluation: inject → detect → confusion matrix,
SURVEY.md §5)."""

import random

import pytest
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import BOILERPLATE, generate_pages
from data_quality_monitoring_spark.operators.injection import (
    apply_rule,
    corrupt_value,
    inject_pages,
)
from data_quality_monitoring_spark.operators.metrics import confusion_matrix
from data_quality_monitoring_spark.plans.pipeline import quality_filter


def _rng():
    return random.Random(42)


@pytest.mark.parametrize(
    "rule,value,expected",
    [
        ({"operation": "string_replace", "params": {"find": "a", "replace": "b"}}, "banana", "bbnbnb"),
        ({"operation": "regex_replace", "params": {"pattern": r"\d+", "replace": "#"}}, "a1b22c", "a#b#c"),
        ({"operation": "regex_replace", "params": {"pattern": r"\d+", "replace": "#", "count": 1}}, "a1b22c", "a#b22c"),
        ({"operation": "prepend", "params": {"text": "x "}}, "y", "x y"),
        ({"operation": "append", "params": {"text": " z"}}, "y", "y z"),
        ({"operation": "replace_with", "params": {"text": "gone"}}, "anything", "gone"),
        ({"operation": "case_change", "params": {"type": "upper"}}, "MiXed", "MIXED"),
        ({"operation": "case_change", "params": {"type": "swap"}}, "MiXed", "mIxED"),
        ({"operation": "truncate", "params": {"length": 3}}, "abcdef", "abc"),
        ({"operation": "reverse"}, "abc", "cba"),
        ({"operation": "character_substitution"}, "x0y0", "xOy0"),  # first occurrence only
        ({"operation": "unknown_op"}, "keep", "keep"),
    ],
)
def test_op_semantics(rule, value, expected):
    assert apply_rule(value, rule, _rng()) == expected


def test_conditions_gate():
    rule = {
        "operation": "replace_with",
        "params": {"text": "X"},
        "conditions": [{"type": "contains", "value": "cotton"}],
    }
    assert apply_rule("pure cotton", rule, _rng()) == "X"
    assert apply_rule("pure wool", rule, _rng()) == "pure wool"
    rule["conditions"] = [{"type": "regex_match", "pattern": r"\d{3}"}]
    assert apply_rule("abc 123", rule, _rng()) == "X"
    rule["conditions"] = [{"type": "not_contains", "value": "123"}]
    assert apply_rule("abc", rule, _rng()) == "X"
    rule["conditions"] = [{"type": "equals", "value": "abc"}]
    assert apply_rule("abc", rule, _rng()) == "X"
    assert apply_rule("abcd", rule, _rng()) == "abcd"


def test_digit_ops_deterministic():
    rule = {"operation": "digit_removal"}
    out1 = apply_rule("a1b2c3", rule, _rng())
    out2 = apply_rule("a1b2c3", rule, _rng())
    assert out1 == out2 and len(out1) == 5
    rule = {"operation": "digit_duplication"}
    out = apply_rule("a1b2", rule, _rng())
    assert len(out) == 5
    rule = {"operation": "digit_replacement"}
    out = apply_rule("a1b2", rule, _rng())
    assert len(out) == 4 and out != "a1b2"


def test_no_eval_in_extract_validate():
    rule = {
        "operation": "regex_extract_validate",
        "params": {"extract_pattern": r"(\d+)%", "comparator": ">", "operand": "50"},
    }
    assert apply_rule("about 80% done", rule, _rng()) == "80"
    assert apply_rule("about 30% done", rule, _rng()) == "about 30% done"


def test_corrupt_value_pure_function():
    rules = [{"name": "r1", "operation": "reverse"}]
    a = corrupt_value("hello world", "https://h/1", rules, 1.0)
    b = corrupt_value("hello world", "https://h/1", rules, 1.0)
    assert a == b == ("dlrow olleh", "r1")
    # different url → independent draw; intensity 0 → never corrupt
    assert corrupt_value("hello", "https://h/1", rules, 0.0) == ("hello", None)
    assert corrupt_value(None, "u", rules, 1.0) == (None, None)


INJECTION_RULES = [
    {"name": "blank_out", "operation": "replace_with", "params": {"text": ""}},
    {"name": "pad_ws", "operation": "prepend", "params": {"text": "  "}},
    {"name": "truncate_hard", "operation": "truncate", "params": {"length": 30}},
    {
        "name": "digit_flood",
        "operation": "append",
        "params": {"text": " " + " ".join(["12345678901234567890"] * 40)},
    },
    {
        "name": "boilerplate_swap",
        "operation": "value_replacement",
        "params": {"replacement_values": [BOILERPLATE]},
    },
]


def test_injection_recovery_f1(spark):
    """Seeded inject → detect → confusion matrix: F1 must be ≥ 0.99 (the
    reference's evaluation loop, seeded so it is reproducible)."""
    pages = generate_pages(spark, 960, partitions=8)
    # clean English buckets only (0-5), minus the hard nulls/empties
    doc_id = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    clean = pages.filter((doc_id % 16 <= 5) & (doc_id % 97 != 13) & (doc_id % 97 != 29))
    corrupted, labels = inject_pages(clean, {"text": INJECTION_RULES}, intensity=0.5)
    n_clean = clean.count()
    n_injected = labels.count()
    assert 0.3 * n_clean < n_injected < 0.7 * n_clean

    detected = (
        quality_filter(spark, corrupted)
        .filter(~F.col("keep"))
        .select("url", F.lit("text").alias("field"))
    )
    cm = confusion_matrix(detected, labels, n_rows=n_clean).collect()[0]
    assert cm["f1"] >= 0.99, dict(cm.asDict())


def test_inject_pages_labels_consistent(spark):
    pages = generate_pages(spark, 320, partitions=4)
    corrupted, labels = inject_pages(pages, {"text": INJECTION_RULES}, intensity=0.3)
    assert corrupted.count() == 320
    lab = labels.toPandas()
    assert (lab["original_value"] != lab["corrupted_value"]).all()
    assert set(lab["rule_name"]) <= {r["name"] for r in INJECTION_RULES}
    # determinism: second run identical
    _, labels2 = inject_pages(pages, {"text": INJECTION_RULES}, intensity=0.3)
    a = lab.sort_values("url").reset_index(drop=True)
    b = labels2.toPandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
