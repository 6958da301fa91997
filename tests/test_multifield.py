"""Multi-field detection over a reference-style catalog table (FIXTURES.md §4)."""

from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.multifield import cell_findings, detect_fields

CATALOG = [
    # (id, material, colour, season, care)
    (1, "95% Cotton, 5% Elastane", "off white", "Fall 2022", "Machine wash 30°C"),
    (2, "95% Cotton, 10% Elastane", "off white", "Fall 2022", "Machine wash 30°C"),  # pct sum
    # note: the reference's year regex only matches 19xx/20xx, so "1875"
    # would pass — 1975 is the out-of-range year it actually catches
    (3, "100% Wool", "engine oil black", "Fall 1975", "Machine wash 30°C"),  # year + unknown colour
    (4, "100% Silk (", "red", "Fall 2022", "Machine wash cold. Do not wash."),  # paren + contradiction
    (5, None, "blue", "Fall 2022", "Hand wash"),  # missing material
]

RULES = {
    "material": [
        {"type": "missing", "error_code": "MISSING_MATERIAL"},
        {"type": "percentage_sum_check", "error_code": "PCT_SUM"},
        {"type": "parenthesis_check", "error_code": "PAREN"},
    ],
    "season": [
        {"type": "year_range_check", "min_year": 2000, "max_year": 2030, "error_code": "YEAR"},
    ],
    "care": [
        {
            "type": "contradiction_check",
            "contradiction_pairs": [["machine wash", "do not wash"]],
            "error_code": "CONTRA",
        },
    ],
}
PATTERNS = {
    "colour": {"known_values": ["off white", "red", "blue", "black"], "probabilities": {}},
}


def test_detect_fields_one_pass(spark):
    df = spark.createDataFrame(CATALOG, ["id", "material", "colour", "season", "care"])
    detected = detect_fields(df, RULES, PATTERNS)
    cells = cell_findings(detected, "id", ["material", "colour", "season", "care"]).collect()
    got = {(r["id"], r["field"]): (r["status"], r["code"]) for r in cells}
    assert got == {
        (2, "material"): ("ERROR", "PCT_SUM"),
        (3, "colour"): ("ANOMALY", "UNKNOWN_VALUE"),
        (3, "season"): ("ERROR", "YEAR"),
        (4, "material"): ("ERROR", "PAREN"),
        (4, "care"): ("ERROR", "CONTRA"),
        (5, "material"): ("ERROR", "MISSING_MATERIAL"),
    }
    # result ordering: (key, field) like the reference sort
    keys = [(r["id"], r["field"]) for r in cells]
    assert keys == sorted(keys)
