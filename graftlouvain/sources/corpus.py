"""Source-code corpus source (S3 in SURVEY.md §2a — [north-star]): the engine's
raw input is a table ``(repo, path, commit, lang, content)`` (BASELINE.json
input_hint). The reference has no file I/O at all (edges arrive as in-memory
slices, tests/distributed_graph.rs:66-71); this module supplies

- :func:`read_corpus` — Iceberg when a catalog is configured, else a parquet
  directory with the identical schema (no Iceberg runtime jar in this sandbox;
  the tradeoff is documented in README.md),
- :func:`generate_corpus` — a deterministic seeded synthetic corpus with
  planted community structure (repos ≈ ground-truth clusters) used by tests
  and the scaling benchmark. Pure function of its parameters: no wall clock,
  all randomness from ``random.Random(seed)``.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graftlouvain.schemas import CORPUS_SCHEMA

_LANGS = ["python", "rust", "go", "java"]
_IMPORT_TEMPLATES = {
    "python": "import {mod}\n",
    "rust": "use {mod};\n",
    "go": "import \"{mod}\"\n",
    "java": "import {mod};\n",
}


def read_corpus(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    """Read the corpus table. ``fmt='iceberg'`` requires an Iceberg catalog on
    the classpath; ``'auto'`` tries iceberg and falls back to parquet."""
    if fmt in ("auto", "iceberg"):
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            if fmt == "iceberg":
                raise
    return spark.read.schema(CORPUS_SCHEMA).parquet(path)


def generate_corpus_rows(
    n_repos: int = 8,
    files_per_repo: int = 16,
    commits_per_repo: int = 24,
    files_per_commit: int = 4,
    p_cross: float = 0.05,
    imports_per_file: int = 3,
    seed: int = 42,
) -> Iterator[tuple[str, str, str, str, str]]:
    """Yield (repo, path, commit, lang, content) rows.

    Structure: each repo has F files; each commit touches ``files_per_commit``
    files of its repo, and with probability ``p_cross`` one extra file of a
    different repo (the inter-community noise). Each file's content embeds
    deterministic import lines referencing other files (mostly same-repo),
    feeding the import-edge extractor.
    """
    rng = random.Random(seed)
    repos = [f"org/repo-{r:04d}" for r in range(n_repos)]
    files = {
        repo: [f"src/mod_{i:04d}.{_ext(lang)}" for i, lang in _file_langs(files_per_repo, rng)]
        for repo in repos
    }
    langs = {
        (repo, path): _lang_of(path) for repo in repos for path in files[repo]
    }
    # deterministic import graph: file -> modules (module name = stem)
    imports: dict[tuple[str, str], list[str]] = {}
    for repo in repos:
        for path in files[repo]:
            tgt_repo = repo if rng.random() > p_cross else rng.choice(repos)
            choices = [p for p in files[tgt_repo] if p != path]
            picks = rng.sample(choices, min(imports_per_file, len(choices)))
            imports[(repo, path)] = [_stem(p) for p in picks]

    # commits: one row per (commit, file) touched
    for repo in repos:
        for c in range(commits_per_repo):
            commit = hashlib.sha1(f"{seed}:{repo}:{c}".encode()).hexdigest()
            touched = rng.sample(files[repo], min(files_per_commit, len(files[repo])))
            touched_pairs = [(repo, p) for p in touched]
            if rng.random() < p_cross:
                other = rng.choice([r for r in repos if r != repo])
                touched_pairs.append((other, rng.choice(files[other])))
            for frepo, fpath in touched_pairs:
                lang = langs[(frepo, fpath)]
                body = "".join(
                    _IMPORT_TEMPLATES[lang].format(mod=m) for m in imports[(frepo, fpath)]
                )
                content = (
                    f"// {frepo}/{fpath}\n{body}"
                    f"fn_or_def body_{_stem(fpath)} seed={seed} commit_tag={c % 7}\n"
                )
                yield (frepo, fpath, commit, lang, content)


def _file_langs(n: int, rng: random.Random):
    for i in range(n):
        yield i, rng.choice(_LANGS)


def _ext(lang: str) -> str:
    return {"python": "py", "rust": "rs", "go": "go", "java": "java"}[lang]


def _lang_of(path: str) -> str:
    ext = path.rsplit(".", 1)[-1]
    return {"py": "python", "rs": "rust", "go": "go", "java": "java"}[ext]


def _stem(path: str) -> str:
    return path.rsplit("/", 1)[-1].rsplit(".", 1)[0]


def generate_corpus(spark: SparkSession, **kwargs) -> DataFrame:
    """Materialize the synthetic corpus as a DataFrame (Arrow path via pandas).
    Sizes used by tests are tiny; the benchmark generator in BENCH/ scales the
    same function up."""
    rows = list(generate_corpus_rows(**kwargs))
    pdf = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    return spark.createDataFrame(pdf, schema=CORPUS_SCHEMA)
