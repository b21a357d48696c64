"""Frozen char-trigram language-ID model — the real-model artifact for the
lang_id_udf pandas-UDF slot (functions/text.py:137).

The reference tags corpus languages with cld3
(/root/reference/scripts/create_corpus.py:41-48); no language-ID wheel ships
in this container, so the model here is a tiny char-trigram linear scorer
trained deterministically by tools/train_lang_model.py and frozen as JSON in
data/lang_trigram_model.json. Scoring is a weighted trigram-hit sum —
exactly expressible as an equi-join + group-by in ANSI SQL, so the DuckDB
oracle for the text_lang_id_model CORRECTNESS entry carries the SAME frozen
weights and the prediction is value-hash-gated, not rows-only.

Decision rule (identical in Python and SQL):
  normalize: lower → collapse ASCII whitespace runs to ' ' → strip → pad a
  single space on each side (RE2-compatible — no Unicode \\s);
  score(lang) = Σ weight(lang, trigram) over all trigram OCCURRENCES;
  predict = argmax score, ties → lexicographically smallest lang,
  max score ≤ 0 → null (score reported as 0).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

import pandas as pd
from pyspark.sql import Column

MODEL_PATH = Path(__file__).resolve().parent.parent / "data/lang_trigram_model.json"

_WS = str.maketrans({c: " " for c in "\t\n\r\f\v"})


@lru_cache(maxsize=1)
def load_model() -> dict:
    return json.loads(MODEL_PATH.read_text())


def normalize(text: str) -> str:
    s = (text or "").lower().translate(_WS)
    s = " ".join(p for p in s.split(" ") if p)
    return f" {s} " if s else ""


def trigrams(s: str) -> list[str]:
    return [s[i : i + 3] for i in range(len(s) - 2)]


def predict_batch(texts: list) -> list[tuple[str | None, int]]:
    """Batch predict → [(lang|None, score)]. Plain dict lookups over the
    frozen weights; ~10^6 trigrams/sec/core, Arrow-batched by the UDF."""
    weights = load_model()["weights"]
    out = []
    for t in texts:
        tris = trigrams(normalize(t))
        scores = {
            lang: sum(w.get(tri, 0) for tri in tris)
            for lang, w in weights.items()
        }
        best = max(scores.values(), default=0)
        if best <= 0:
            out.append((None, 0))
        else:
            out.append(
                (min(k for k, v in scores.items() if v == best), int(best))
            )
    return out


def model_predict(texts: list) -> list:
    """Adapter with the lang_id_udf(model_predict=...) slot signature
    (list[str] → list[str|None]): drops the score."""
    return [lang for lang, _ in predict_batch(texts)]


def lang_model_udf():
    """Pandas UDF: text → struct<pred_lang string, score long> (select the
    fields out for flat output)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("pred_lang string, score long")
    def _predict(texts: pd.Series) -> pd.DataFrame:
        rows = predict_batch(texts.tolist())
        return pd.DataFrame(rows, columns=["pred_lang", "score"])

    return _predict


def predict_lang(text: Column | str) -> Column:
    """Column helper: struct<pred_lang, score> from the frozen model."""
    from pyspark.sql import functions as F

    c = F.col(text) if isinstance(text, str) else text
    return lang_model_udf()(c)


def oracle_weight_values() -> str:
    """The frozen weights as a SQL VALUES list — the oracle side of the
    text_lang_id_model entry embeds EXACTLY the committed artifact."""
    weights = load_model()["weights"]
    rows = []
    for lang in sorted(weights):
        for tri, w in sorted(weights[lang].items()):
            tri_sql = tri.replace("'", "''")
            rows.append(f"('{lang}', '{tri_sql}', {w})")
    return ",\n    ".join(rows)
