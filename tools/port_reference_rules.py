"""Translate the reference rule corpora into the repo's compact ruleset format.

Reads the reference's validator rules (``validators/rules/*/baseline.json``),
pattern-detector rules (``anomaly_detectors/pattern_based/rules/*/baseline.json``)
and error/anomaly injection rules (``validators/error_injection_rules/*``,
``anomaly_detectors/anomaly_injection_rules/*``) and emits one compact JSON per
field under ``data_quality_monitoring_spark/rulesets/catalog/``.

Translation, not a copy: the output uses the repo's flat rule grammar
(rules.py / patterns.py / injection.py), drops the reference's prose
description blocks, renames parameters to the repo's names
(min_celsius → min_temp), and folds the reference's regex+min_length combo
into a single quantified pattern.  Every emitted file cites its source path.

Run once; the emitted files are committed.  Idempotent.
"""

from __future__ import annotations

import json
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parents[1] / "data_quality_monitoring_spark" / "rulesets" / "catalog"

_KNOWN_OPS = {
    # keep in sync with operators/injection.py apply_rule
    "string_replace", "regex_replace", "prepend", "append", "replace_with",
    "random_noise", "regex_extract_validate", "case_change", "truncate",
    "reverse", "digit_replacement", "digit_removal", "digit_duplication",
    "character_substitution", "value_replacement",
}

_PARAM_RENAMES = {"min_celsius": "min_temp", "max_celsius": "max_temp"}
_DROP_KEYS = {"description", "message"}


def _translate_rule(rule: dict) -> dict:
    out = {}
    for k, v in rule.items():
        if k in _DROP_KEYS:
            continue
        out[_PARAM_RENAMES.get(k, k)] = v
    # regex + min_length gate → fold the length into the pattern when the
    # pattern is a single anchored char-class (the only form the reference
    # corpus uses, e.g. care_instructions all_caps)
    if out.get("type") == "regex" and "min_length" in out:
        pat, n = out["pattern"], int(out.pop("min_length"))
        if pat.startswith("^") and pat.endswith("+$"):
            out["pattern"] = f"{pat[:-2]}{{{n},}}$"
    return out


def port_validators() -> list[str]:
    emitted = []
    src_root = REF / "validators" / "rules"
    for field_dir in sorted(src_root.iterdir()):
        src = field_dir / "baseline.json"
        if not src.exists():
            continue
        raw = json.loads(src.read_text())
        field = raw.get("field_name", field_dir.name)
        doc = {
            "field": field,
            "comment": (
                f"Ported from reference validators/rules/{field_dir.name}/baseline.json "
                f"(translated to the repo rule grammar; see rules.py)"
            ),
            "rules": [_translate_rule(r) for r in raw.get("validation_rules", [])],
            "error_messages": raw.get("error_messages", {}),
        }
        dest = OUT / "validators" / f"{field}.json"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(json.dumps(doc, indent=1) + "\n")
        emitted.append(str(dest))
    return emitted


def port_patterns() -> list[str]:
    emitted = []
    src_root = REF / "anomaly_detectors" / "pattern_based" / "rules"
    for field_dir in sorted(src_root.iterdir()):
        src = field_dir / "baseline.json"
        if not src.exists():
            continue
        raw = json.loads(src.read_text())
        field = raw.get("field_name", field_dir.name)
        probs = {}
        fmt = []
        for fp in raw.get("format_patterns", []):
            fmt.append(fp["pattern"])
            probs.setdefault("INVALID_FORMAT", float(fp.get("probability", 0.8)))
        doc = {
            "field": field,
            "comment": (
                f"Ported from reference anomaly_detectors/pattern_based/rules/"
                f"{field_dir.name}/baseline.json (pattern_finding grammar)"
            ),
            "format_patterns": fmt,
            "known_values": raw.get("known_values", []),
            "probabilities": probs,
        }
        for vr in raw.get("validation_rules", []):
            t = vr.get("type")
            if t == "not_empty":
                doc["not_empty"] = True
                probs.setdefault("EMPTY_VALUE", float(vr.get("probability", 0.9)))
            elif t == "max_length":
                doc["max_length"] = int(vr["max_length"])
                probs.setdefault("MAX_LENGTH", float(vr.get("probability", 0.8)))
            elif t == "min_length":
                doc["min_length"] = int(vr["min_length"])
                probs.setdefault("MIN_LENGTH", float(vr.get("probability", 0.8)))
        dest = OUT / "patterns" / f"{field}.json"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(json.dumps(doc, indent=1) + "\n")
        emitted.append(str(dest))
    return emitted


def port_injections(src_name: str, out_name: str) -> list[str]:
    emitted = []
    src_root = REF / src_name
    if not src_root.exists():
        return emitted
    for field_dir in sorted(src_root.iterdir()):
        src = field_dir / "baseline.json"
        if not src.exists() or field_dir.name == "template":
            continue
        raw = json.loads(src.read_text())
        rules = []
        for r in raw.get("error_rules", []) + raw.get("anomaly_rules", []):
            if r.get("operation") not in _KNOWN_OPS:
                print(f"  skip unknown op {r.get('operation')!r} in {src}")
                continue
            t = {k: v for k, v in r.items() if k not in _DROP_KEYS}
            t["name"] = t.pop("rule_name", t.get("name", r["operation"]))
            rules.append(t)
        doc = {
            "field": field_dir.name,
            "comment": f"Ported from reference {src_name}/{field_dir.name}/baseline.json",
            "rules": rules,
        }
        dest = OUT / out_name / f"{field_dir.name}.json"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(json.dumps(doc, indent=1) + "\n")
        emitted.append(str(dest))
    return emitted


if __name__ == "__main__":
    n = 0
    for group, files in [
        ("validators", port_validators()),
        ("patterns", port_patterns()),
        ("error_injection", port_injections("validators/error_injection_rules", "error_injection")),
        (
            "anomaly_injection",
            port_injections("anomaly_detectors/anomaly_injection_rules", "anomaly_injection"),
        ),
    ]:
        print(f"{group}: {len(files)} files")
        n += len(files)
    print(f"total {n} ruleset files → {OUT}")
