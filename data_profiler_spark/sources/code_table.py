"""Deterministic synthetic source-code table (the north-rule input shape).

Schema (BASELINE.json input_hint):
    code_files(repo string, path string, commit string, lang string, content string)
    commits(repo string, commit string, committed_at timestamp)

Everything is generated DISTRIBUTED from ``spark.range(n)`` with native
column expressions only — a pure function of (seed, n_rows), identical on
every run and at every parallelism, so it scales to bench sizes (1e7 rows)
without driver involvement. Mirrors FIXTURES.md §1-2:

- repo ~ Zipf(a=1.5) over ``n_repos`` repos (skewed mega-repos exercise the
  salted uniqueness groupBy);
- ~0.2% of rows are duplicated verbatim on (repo, path, commit) — the
  uniqueness violations; content identical across the pair so
  sha256(content) matches (the per-row fidelity invariant);
- ~0.5% of rows get an orphan commit absent from ``commits`` — the
  referential violations;
- length(content) ~ lognormal(mu=7, sigma=1.2); ~1% empty, ~0.3% NULL;
- ``drifted=True`` shifts lang weights and the length mu by +0.4 (the
  drift-positive fixture for KS / chi-square checks).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_REPOS = 200
ZIPF_A = 1.5
DUP_FRACTION = 0.002
ORPHAN_FRACTION = 0.005
NULL_FRACTION = 0.003
EMPTY_FRACTION = 0.01

LANGS = ["python", "java", "go", "ts", "rust", "c", "md", "yaml", "other"]
LANG_WEIGHTS = [0.26, 0.16, 0.10, 0.12, 0.06, 0.08, 0.10, 0.07, 0.05]
LANG_WEIGHTS_DRIFTED = [0.16, 0.12, 0.08, 0.22, 0.14, 0.06, 0.10, 0.07, 0.05]
LANG_EXT = {
    "python": "py", "java": "java", "go": "go", "ts": "ts", "rust": "rs",
    "c": "c", "md": "md", "yaml": "yaml", "other": "txt",
}
_DIRS = ["core", "util", "api", "io", "net", "ui", "db", "ops", "test", "cli"]
_PHRASES = [
    "def compute(x): return x * 2  # deterministic body ",
    "public static void main(String[] args) { run(); } ",
    "func handler(w http.ResponseWriter, r *http.Request) {} ",
    "export const value: number = 42; // module constant ",
    "fn process(input: &str) -> Result<(), Error> { Ok(()) } ",
]


def _u(col: Column, seed: int, tag: str) -> Column:
    """Deterministic uniform(0,1) from a 64-bit hash of (col, seed, tag)."""
    h = F.xxhash64(col, F.lit(seed), F.lit(tag))
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def _zipf_cdf(n: int, a: float) -> list[float]:
    weights = [1.0 / (k + 1) ** a for k in range(n)]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    return cdf


def _cdf_pick(u: Column, cdf: list[float]) -> Column:
    """Index of the first CDF entry >= u, as a JVM-side O(K) fold."""
    arr = F.array(*[F.lit(c) for c in cdf])
    return F.aggregate(
        arr, F.lit(0), lambda acc, c: acc + F.when(c < u, 1).otherwise(0)
    )


def _n_commits_for_repo(repo_idx: Column) -> Column:
    # Mega-repos (low zipf index) get more commits: 500 down to 1.
    return F.greatest(
        F.lit(1), (F.lit(500) / F.pow(repo_idx + 1, F.lit(0.8))).cast("int")
    )


def _commit_hex(repo: Column, commit_idx: Column) -> Column:
    return F.md5(F.concat(F.lit("commit:"), repo, F.lit(":"), commit_idx.cast("string")))


def generate_code_files(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    drifted: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """The ``code_files`` fixture; includes injected duplicates + orphans."""
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    repo_idx = _cdf_pick(_u(i, seed, "repo"), _zipf_cdf(N_REPOS, ZIPF_A))
    repo = F.concat(
        F.lit("org"), F.pmod(repo_idx, F.lit(7)).cast("string"),
        F.lit("/repo"), repo_idx.cast("string"),
    )

    lang_w = LANG_WEIGHTS_DRIFTED if drifted else LANG_WEIGHTS
    cdf_l, acc = [], 0.0
    for w in lang_w:
        acc += w
        cdf_l.append(min(acc, 1.0))
    lang_idx = _cdf_pick(_u(i, seed, "lang"), cdf_l)
    langs_arr = F.array(*[F.lit(x) for x in LANGS])
    exts_arr = F.array(*[F.lit(LANG_EXT[x]) for x in LANGS])
    lang = F.element_at(langs_arr, lang_idx + 1)
    ext = F.element_at(exts_arr, lang_idx + 1)

    dirs_arr = F.array(*[F.lit(d) for d in _DIRS])
    path = F.concat(
        F.lit("src/"),
        F.element_at(dirs_arr, (F.pmod(F.xxhash64(i, F.lit(seed), F.lit("dir")), F.lit(len(_DIRS)))).cast("int") + 1),
        F.lit("/f_"),
        F.substring(F.md5(F.concat(F.lit("path:"), i.cast("string"))), 1, 10),
        F.lit("."), ext,
    )

    n_commits = _n_commits_for_repo(repo_idx)
    commit_idx = (_u(i, seed, "commitpick") * n_commits.cast("double")).cast("int")
    is_orphan = _u(i, seed, "orphan") < ORPHAN_FRACTION
    commit = F.when(
        is_orphan, F.md5(F.concat(F.lit("orphan:"), i.cast("string")))
    ).otherwise(_commit_hex(repo, commit_idx))

    # length(content) ~ lognormal via Box-Muller on two deterministic uniforms
    mu = 7.0 + (0.4 if drifted else 0.0)
    sigma = 1.2
    u1 = F.greatest(_u(i, seed, "bm1"), F.lit(1e-12))
    u2 = _u(i, seed, "bm2")
    gauss = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    length = F.least(
        F.greatest((F.exp(F.lit(mu) + F.lit(sigma) * gauss)).cast("int"), F.lit(1)),
        F.lit(1_000_000),
    )

    phrases_arr = F.array(*[F.lit(p) for p in _PHRASES])
    phrase = F.element_at(
        phrases_arr,
        (F.pmod(F.xxhash64(i, F.lit(seed), F.lit("phrase")), F.lit(len(_PHRASES)))).cast("int") + 1,
    )
    header = F.concat(F.lit("// file "), i.cast("string"), F.lit(" "))
    body = F.substring(
        F.repeat(phrase, (length / F.length(phrase)).cast("int") + 1), 1, length
    )
    u_nullempty = _u(i, seed, "nullempty")
    content = (
        F.when(u_nullempty < NULL_FRACTION, F.lit(None).cast("string"))
        .when(u_nullempty < NULL_FRACTION + EMPTY_FRACTION, F.lit(""))
        .otherwise(F.concat(header, body))
    )

    rows = base.select(
        i.alias("id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )

    # Duplicate injection: re-emit ~0.2% of rows verbatim (same content bytes).
    dups = rows.where(_u(F.col("id"), seed, "dup") < DUP_FRACTION)
    return rows.unionAll(dups).drop("id")


def generate_commits(
    spark: SparkSession, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """The ``commits`` referential dimension: every non-orphan (repo, commit)."""
    repos = spark.range(0, N_REPOS, 1, partitions or 8)
    r = F.col("id")
    repo = F.concat(
        F.lit("org"), F.pmod(r, F.lit(7)).cast("string"), F.lit("/repo"), r.cast("string")
    )
    n_commits = _n_commits_for_repo(r)
    exploded = repos.select(
        repo.alias("repo"), F.explode(F.sequence(F.lit(0), n_commits - 1)).alias("cidx")
    )
    committed_at = F.to_timestamp(
        F.lit("2020-01-01 00:00:00")
    ) + F.make_interval(hours=F.col("cidx") * 7)
    return exploded.select(
        "repo",
        _commit_hex(F.col("repo"), F.col("cidx")).alias("commit"),
        committed_at.alias("committed_at"),
    )
