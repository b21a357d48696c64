"""Train (deterministically, stdlib-only) the frozen char-trigram language-ID
model at archive_query_log_spark/data/lang_trigram_model.json.

The reference pipeline uses cld3 for corpus language tagging
(/root/reference/scripts/create_corpus.py:41-48); no language-ID wheel ships
in this container, so the repo carries (a) a JVM-side stopword heuristic
(functions/text.py:lang_id) and (b) THIS artifact — a tiny char-trigram
linear scorer that plugs into the lang_id_udf pandas-UDF model slot and is
exactly reproducible in ANSI SQL, so the DuckDB oracle can carry the same
frozen weights (CORRECTNESS entry text_lang_id_model).

Model: for each of 12 languages, the top trigrams of a small embedded
training corpus, weighted by frequency × purity:

    w(lang, tri) = round(10^6 · f_lang(tri) · f_lang(tri) / Σ_l f_l(tri))

computed in exact rational arithmetic (fractions.Fraction) so the artifact
is bit-identical on every platform/Python. Scoring at inference is a plain
weighted trigram-hit sum (argmax; ties → lexicographically smallest
language; max ≤ 0 → null) — expressible as an equi-join + group-by in both
Spark and SQL. Text normalization is the ASCII-whitespace collapse both
RE2 (DuckDB) and Python produce identically: lower, [ \\t\\n\\r\\f\\v]+ → ' ',
strip, pad one space each side.

Run:  python tools/train_lang_model.py      (rewrites the artifact; the
regeneration test asserts byte identity with the committed file)
"""

from __future__ import annotations

import json
from collections import Counter
from fractions import Fraction
from pathlib import Path

OUT = (
    Path(__file__).resolve().parent.parent
    / "archive_query_log_spark/data/lang_trigram_model.json"
)

TOP_K = 256
SCALE = 1_000_000

# Hand-written training sentences (generic prose, authored for this tool —
# NOT drawn from the reference or any corpus). Disjoint from the evaluation
# bank in entry_queries.py.
CORPUS: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that they would have been there before the end of the day",
        "this is a simple sentence written in plain english for training",
        "many people think that reading books is one of the best habits",
        "the weather was cold and the children stayed inside the house",
        "we should always try to learn something new from our mistakes",
        "he walked through the old town and looked at the small shops",
        "there are many different ways to solve this kind of problem",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "sie sagte dass sie vor dem ende des tages dort gewesen wären",
        "dies ist ein einfacher satz der auf deutsch geschrieben wurde",
        "viele menschen denken dass lesen eine der besten gewohnheiten ist",
        "das wetter war kalt und die kinder blieben im haus bei der mutter",
        "wir sollten immer versuchen etwas neues aus unseren fehlern zu lernen",
        "er ging durch die alte stadt und schaute sich die kleinen läden an",
        "es gibt viele verschiedene wege um diese art von problem zu lösen",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux près de la rivière",
        "elle a dit qu ils auraient été là avant la fin de la journée",
        "ceci est une phrase simple écrite en français pour l entraînement",
        "beaucoup de gens pensent que lire des livres est une très bonne habitude",
        "le temps était froid et les enfants sont restés dans la maison",
        "nous devrions toujours essayer d apprendre quelque chose de nos erreurs",
        "il a marché dans la vieille ville et a regardé les petits magasins",
        "il existe de nombreuses façons de résoudre ce genre de problème",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso cerca del río",
        "ella dijo que habrían estado allí antes del final del día",
        "esta es una oración sencilla escrita en español para el entrenamiento",
        "mucha gente piensa que leer libros es uno de los mejores hábitos",
        "el tiempo estaba frío y los niños se quedaron dentro de la casa",
        "siempre deberíamos intentar aprender algo nuevo de nuestros errores",
        "él caminó por el casco antiguo y miró las pequeñas tiendas",
        "hay muchas maneras diferentes de resolver este tipo de problema",
    ],
    "it": [
        "la veloce volpe marrone salta sopra il cane pigro vicino al fiume",
        "lei ha detto che sarebbero stati lì prima della fine della giornata",
        "questa è una frase semplice scritta in italiano per l addestramento",
        "molte persone pensano che leggere libri sia una delle migliori abitudini",
        "il tempo era freddo e i bambini sono rimasti dentro la casa",
        "dovremmo sempre cercare di imparare qualcosa dai nostri errori",
        "lui ha camminato per la città vecchia e ha guardato i piccoli negozi",
        "ci sono molti modi diversi per risolvere questo tipo di problema",
    ],
    "pt": [
        "a rápida raposa marrom pula sobre o cão preguiçoso perto do rio",
        "ela disse que eles teriam estado lá antes do fim do dia",
        "esta é uma frase simples escrita em português para o treinamento",
        "muitas pessoas acham que ler livros é um dos melhores hábitos",
        "o tempo estava frio e as crianças ficaram dentro de casa",
        "devemos sempre tentar aprender algo novo com os nossos erros",
        "ele andou pela cidade velha e olhou para as pequenas lojas",
        "existem muitas maneiras diferentes de resolver este tipo de problema",
    ],
    "nl": [
        "de snelle bruine vos springt over de luie hond bij de rivier",
        "ze zei dat ze er voor het einde van de dag geweest zouden zijn",
        "dit is een eenvoudige zin die in het nederlands is geschreven",
        "veel mensen denken dat boeken lezen een van de beste gewoonten is",
        "het weer was koud en de kinderen bleven binnen in het huis",
        "we zouden altijd iets nieuws moeten proberen te leren van onze fouten",
        "hij liep door de oude stad en keek naar de kleine winkels",
        "er zijn veel verschillende manieren om dit soort problemen op te lossen",
    ],
    "sv": [
        "den snabba bruna räven hoppar över den lata hunden vid floden",
        "hon sa att de skulle ha varit där före slutet av dagen",
        "detta är en enkel mening som är skriven på svenska för träning",
        "många människor tycker att läsa böcker är en av de bästa vanorna",
        "vädret var kallt och barnen stannade inne i huset hela dagen",
        "vi borde alltid försöka lära oss något nytt av våra misstag",
        "han gick genom den gamla staden och tittade på de små butikerna",
        "det finns många olika sätt att lösa den här typen av problem",
    ],
    "pl": [
        "szybki brązowy lis skacze nad leniwym psem w pobliżu rzeki",
        "powiedziała że byliby tam przed końcem dnia gdyby mogli",
        "to jest proste zdanie napisane po polsku do treningu modelu",
        "wiele osób uważa że czytanie książek jest jednym z najlepszych nawyków",
        "pogoda była zimna a dzieci zostały w domu przez cały dzień",
        "zawsze powinniśmy starać się uczyć czegoś nowego na własnych błędach",
        "szedł przez stare miasto i oglądał małe sklepy przy rynku",
        "istnieje wiele różnych sposobów rozwiązania tego rodzaju problemu",
    ],
    "tr": [
        "hızlı kahverengi tilki nehrin yanındaki tembel köpeğin üzerinden atlar",
        "günün sonundan önce orada olacaklarını söyledi bize dün akşam",
        "bu eğitim için türkçe yazılmış basit bir cümledir arkadaşlar",
        "birçok insan kitap okumanın en iyi alışkanlıklardan biri olduğunu düşünür",
        "hava soğuktu ve çocuklar bütün gün evin içinde kaldılar",
        "her zaman hatalarımızdan yeni bir şeyler öğrenmeye çalışmalıyız",
        "eski şehirde yürüdü ve küçük dükkanlara baktı uzun uzun",
        "bu tür bir sorunu çözmenin birçok farklı yolu vardır elbette",
    ],
    "id": [
        "rubah coklat yang cepat melompati anjing malas di dekat sungai",
        "dia berkata bahwa mereka akan sudah berada di sana sebelum akhir hari",
        "ini adalah kalimat sederhana yang ditulis dalam bahasa indonesia untuk pelatihan",
        "banyak orang berpikir bahwa membaca buku adalah salah satu kebiasaan terbaik",
        "cuaca sangat dingin dan anak anak tetap berada di dalam rumah",
        "kita harus selalu mencoba belajar sesuatu yang baru dari kesalahan kita",
        "dia berjalan melewati kota tua dan melihat toko toko kecil",
        "ada banyak cara yang berbeda untuk menyelesaikan masalah semacam ini",
    ],
    "ru": [
        "быстрая коричневая лиса прыгает через ленивую собаку у реки",
        "она сказала что они были бы там до конца дня если бы могли",
        "это простое предложение написанное на русском языке для обучения",
        "многие люди думают что чтение книг одна из лучших привычек",
        "погода была холодной и дети весь день оставались в доме",
        "мы всегда должны стараться учиться чему то новому на своих ошибках",
        "он шёл по старому городу и смотрел на маленькие магазины",
        "есть много разных способов решить задачу такого рода",
    ],
}

_WS = str.maketrans({c: " " for c in "\t\n\r\f\v"})


def normalize(text: str) -> str:
    """lower → ASCII-whitespace collapse → strip → single-space padding.
    Matches the RE2 semantics the DuckDB oracle uses (regexp_replace with
    [ \\t\\n\\r\\f\\v]+ — NOT \\s, which is Unicode-wide in Python but
    ASCII-only in RE2)."""
    s = text.lower().translate(_WS)
    s = " ".join(p for p in s.split(" ") if p)
    return f" {s} " if s else ""


def trigrams(s: str) -> list[str]:
    return [s[i : i + 3] for i in range(len(s) - 2)]


def train() -> dict:
    counts = {
        lang: Counter(t for sent in sents for t in trigrams(normalize(sent)))
        for lang, sents in CORPUS.items()
    }
    totals = {lang: sum(c.values()) for lang, c in counts.items()}
    freq = {
        lang: {t: Fraction(n, totals[lang]) for t, n in c.items()}
        for lang, c in counts.items()
    }
    doc_freq: dict[str, Fraction] = {}
    for lang, f in freq.items():
        for t, v in f.items():
            doc_freq[t] = doc_freq.get(t, Fraction(0)) + v
    weights: dict[str, dict[str, int]] = {}
    for lang, f in freq.items():
        scored = {}
        for t, v in f.items():
            w = round(Fraction(SCALE) * v * v / doc_freq[t])
            if w >= 1:
                scored[t] = int(w)
        top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        weights[lang] = dict(sorted(top))
    return {
        "_provenance": (
            "trained by tools/train_lang_model.py from its embedded corpus; "
            "exact rational arithmetic — regeneration is byte-identical"
        ),
        "scale": SCALE,
        "top_k": TOP_K,
        "langs": sorted(CORPUS),
        "weights": weights,
    }


def main() -> None:
    model = train()
    OUT.write_text(json.dumps(model, ensure_ascii=False, indent=1, sort_keys=True) + "\n")
    n = sum(len(w) for w in model["weights"].values())
    print(f"wrote {OUT} ({n} trigram weights, {len(model['weights'])} languages)")


if __name__ == "__main__":
    main()
