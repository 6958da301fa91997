"""Unicode text normalization: NFC + control-character strip.

The ftfy-ish cleanup tier every multilingual web corpus needs before
hashing, dedup or tokenization: visually-identical strings with different
code-point sequences (decomposed accents, ligature forms) must hash the
same, and stray C0/C1 controls from broken encodings must go.

* NFC runs in an Arrow-batched pandas UDF over ``unicodedata.normalize``
  (C-implemented; there is no native Spark SQL NFC as of 4.x).  The DuckDB
  oracle uses ``nfc_normalize`` — both implement UAX #15, verified
  char-for-char in tests and the ``normalize_unicode`` contract query.
* the control strip is a native ``regexp_replace`` (whole-stage codegen);
  the class keeps ``\\t \\n \\x0B \\x0C \\r`` (whitespace handled by the
  rule engine's shared class) and removes the rest of C0 plus DEL.

Order is semantics: NFC first, strip second — identical in both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONTROL_CLASS = r"[\x00-\x08\x0E-\x1F\x7F]"


def nfc_column(col: Column) -> Column:
    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None else unicodedata.normalize("NFC", t))

    return _nfc(col)


def normalize_text(col: Column) -> Column:
    """NFC-normalize then strip control characters (C0 minus \\t\\n\\x0B\\x0C\\r, plus DEL)."""
    return F.regexp_replace(nfc_column(col), CONTROL_CLASS, "")


def normalize_sql(expr: str) -> str:
    """The identical normalization in DuckDB SQL (oracle side)."""
    return f"regexp_replace(nfc_normalize({expr}), '{CONTROL_CLASS}', '', 'g')"
