"""Rule-grammar → ANSI-SQL compiler: the DuckDB side of the multifield oracle.

A second, independent implementation of the validation rule grammar
(reference ``validators/json_validator.py:66-284``; Spark side in
``operators/rules.py``): each rule compiles to a boolean SQL expression over
a column, and a ruleset compiles to a first-hit CASE chain.  DuckDB's regex
engine is RE2, which has no lookaround — ``sql_safe_rules`` filters those
out so contract queries run the identical subset on both engines (the full
rulesets, lookarounds included, are parity-tested against the pure-Python
oracle in pytest instead).

The whitespace class is the explicit ``[ \\t\\n\\r\\f\\x0B]`` everywhere —
see operators/rules.py:_WS for why \\v must not appear in any pattern.
"""

from __future__ import annotations

_WS = "[ \\t\\n\\r\\f\\x0B]"  # single-backslash once inside the SQL literal
_LOOKAROUND = ("(?=", "(?!", "(?<=", "(?<!")


def sql_safe_rules(rules: list[dict]) -> list[dict]:
    """Drop rules whose regexes RE2 cannot run (lookaround)."""

    def pats(rule: dict) -> list[str]:
        return (
            [rule.get("pattern", "")]
            + rule.get("patterns", [])
            + rule.get("exclude_patterns", [])
        )

    return [
        r
        for r in rules
        if not any(tok in p for p in pats(r) for tok in _LOOKAROUND)
    ]


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _rx(col: str, pattern: str, ci: bool = False) -> str:
    opts = ", 'i'" if ci else ""
    return f"regexp_matches({col}, {_q(pattern)}{opts})"


def rule_fire_sql(col: str, rule: dict) -> str:
    """One rule → boolean SQL (null input ⇒ NULL/false, callers guard)."""
    rt = rule["type"]
    ci = bool(rule.get("case_insensitive"))
    if rt == "missing":
        return f"{col} IS NULL"
    if rt == "type_check":
        if rule.get("expected_type", "string") in ("numeric", "float", "int"):
            return f"try_cast({col} AS DOUBLE) IS NULL"
        return "FALSE"
    if rt == "empty_string":
        return f"{col} = ''"
    if rt == "whitespace":
        return _rx(col, f"^{_WS}|{_WS}$")
    if rt == "min_length":
        return f"length({col}) < {int(rule['min_length'])}"
    if rt == "max_length":
        return f"length({col}) > {int(rule['max_length'])}"
    if rt == "regex":
        fire = _rx(col, rule["pattern"], ci)
        for ex in rule.get("exclude_patterns", []):
            fire += f" AND NOT {_rx(col, '^(?:' + ex + ')', ci)}"
        return fire
    if rt == "regex_multiple":
        return "(" + " OR ".join(_rx(col, p, ci) for p in rule["patterns"]) + ")"
    if rt == "regex_negative":
        hit = " OR ".join(_rx(col, "^(?:" + p + ")", ci) for p in rule["patterns"])
        return f"NOT ({hit})"
    if rt == "keyword_check":
        cs = bool(rule.get("case_sensitive"))
        target = col if cs else f"lower({col})"
        kws = [k if cs else k.lower() for k in rule["required_keywords"]]
        present = " OR ".join(f"contains({target}, {_q(k)})" for k in kws)
        return f"NOT ({present})"
    if rt == "keyword_blocklist":
        present = " OR ".join(
            f"contains(lower({col}), {_q(k.lower())})" for k in rule["blocked_keywords"]
        )
        return f"({present})"
    if rt == "percentage_sum_check":
        tol = float(rule.get("tolerance", 0.1))
        target = float(rule.get("target", 100.0))
        pcts = f"regexp_extract_all({col}, '(\\d+(?:\\.\\d+)?){_WS}*%', 1)"
        total = f"list_sum(list_transform({pcts}, x -> x::DOUBLE))"
        return f"(len({pcts}) > 0 AND abs({total} - {target}) > {tol})"
    if rt == "parenthesis_check":
        return (
            f"(length({col}) - length(replace({col}, '(', '')))"
            f" <> (length({col}) - length(replace({col}, ')', '')))"
        )
    if rt == "year_range_check":
        lo, hi = int(rule["min_year"]), int(rule["max_year"])
        years = f"regexp_extract_all({col}, '\\b(19\\d{{2}}|20\\d{{2}})\\b', 1)"
        return f"len(list_filter({years}, y -> y::INT < {lo} OR y::INT > {hi})) > 0"
    if rt == "temperature_check":
        lo, hi = float(rule["min_temp"]), float(rule["max_temp"])
        temps = f"regexp_extract_all({col}, '(\\d+){_WS}*°?{_WS}*[CcFf]', 1)"
        cels = (
            f"list_transform({temps}, t -> CASE WHEN t::DOUBLE > 100.0 "
            f"THEN (t::DOUBLE - 32.0) * 5.0 / 9.0 ELSE t::DOUBLE END)"
        )
        return f"len(list_filter({cels}, c -> c < {lo} OR c > {hi})) > 0"
    if rt == "contradiction_check":
        parts = [
            f"(contains(lower({col}), {_q(a.lower())}) AND contains(lower({col}), {_q(b.lower())}))"
            for a, b in rule["contradiction_pairs"]
        ]
        return "(" + " OR ".join(parts) + ")"
    raise ValueError(f"no SQL form for rule type {rt}")


def first_hit_index_sql(col: str, rules: list[dict]) -> str:
    """First-hit CASE: returns the 0-based index of the first firing rule,
    NULL when the value passes.  Null-skip per reference json_validator.py
    :89-91 — only `missing` can fire on NULL."""
    whens = []
    for i, rule in enumerate(rules):
        fire = rule_fire_sql(col, rule)
        if rule["type"] != "missing":
            fire = f"({col} IS NOT NULL AND ({fire}))"
        whens.append(f"WHEN {fire} THEN {i}")
    return "CASE " + " ".join(whens) + " END"


def rule_lookup_values_sql(rules: list[dict]) -> str:
    """VALUES list (hit, rule, code, probability) for joining hit indices
    back to finding metadata."""
    rows = []
    for i, r in enumerate(rules):
        name = r.get("name", r["type"])
        code = r.get("error_code", r["type"].upper())
        prob = float(r.get("probability", 1.0))
        rows.append(f"({i}, {_q(name)}, {_q(code)}, {prob})")
    return ", ".join(rows)
