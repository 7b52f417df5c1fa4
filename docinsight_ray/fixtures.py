"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Generates the north-rule input table ``(repo, path, commit, lang,
content)`` with the properties the tests and the skew handling need:

- byte-identical output for a given (seed, n_docs);
- Zipf(α≈1.1) identifier distribution over a 20k-identifier vocabulary
  with camelCase / snake_case / SCREAMING_CASE / digit shapes;
- hot tokens (``public import return def class static``) in well over
  50% of documents — triggers hot-term salting;
- 1% exact-content duplicates under distinct (repo, path, commit) —
  exercises sha256 dedup (reference semantics:
  /root/reference/ingestion/pipeline_ingest.py:266-269);
- an embedded IR-Plag-shaped conformance subset mirroring
  /root/reference/data/sourcecode/ (7 cases × {original, plagiarized
  L1–L6 variants, non-plagiarized}), membership encoded in
  (repo, path) exactly like the reference layout.

No external data; everything derives from the seed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HOT_TOKENS = ["public", "import", "return", "def", "class", "static", "void", "new"]
_WORDS = [
    "get", "set", "parse", "build", "index", "query", "token", "score", "merge",
    "block", "list", "node", "tree", "hash", "map", "file", "read", "write",
    "buffer", "stream", "count", "total", "value", "item", "data", "meta",
    "cache", "batch", "shard", "delta", "code", "term", "doc", "rank", "heap",
]


_SYL = [c + v for c in "bcdfgklmnprstvz" for v in ("a", "e", "i", "o", "u", "ar", "en", "or")]


def _atom(i: int) -> str:
    """Unique pronounceable lowercase word for index i — atoms survive
    identifier splitting intact, so the post-split term vocabulary has
    the same cardinality as the identifier vocabulary (needed for
    realistic Zipf df distributions under the code tokenizer)."""
    s = _SYL[i % len(_SYL)] + _SYL[(i // len(_SYL)) % len(_SYL)]
    j = i // (len(_SYL) ** 2)
    while j:
        s += _SYL[j % len(_SYL)]
        j //= len(_SYL)
    return s


def _make_vocab(size: int) -> list[str]:
    vocab = []
    for i in range(size):
        a, b = _atom(2 * i), _atom(2 * i + 1)
        w = _WORDS[i % len(_WORDS)]
        shape = i % 4
        if shape == 0:  # camelCase (splits back into a, w, b)
            ident = a + w.capitalize() + b.capitalize()
        elif shape == 1:  # snake_case
            ident = f"{a}_{w}_{b}"
        elif shape == 2:  # SCREAMING_CASE
            ident = f"{a.upper()}_{b.upper()}{i % 31}"
        else:  # PascalCase w/ digits
            ident = a.capitalize() + str(i % 89) + b.capitalize()
        vocab.append(ident)
    return vocab


def _zipf_probs(size: int, alpha: float = 1.1) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), alpha)
    return p / p.sum()


def _doc_body(rng: np.random.Generator, vocab: list[str], probs: np.ndarray, n_lines: int, cls: str) -> str:
    ids = np.array(vocab, dtype=object)[rng.choice(len(vocab), size=n_lines * 3, p=probs)]
    lines = [f"import core.{ids[0]};", f"public class {cls} {{"]
    for j in range(n_lines):
        a, b, c = ids[3 * j], ids[3 * j + 1], ids[3 * j + 2]
        kind = int(rng.integers(0, 4))
        if kind == 0:
            lines.append(f"    public static int {a}({b} x) {{ return {c}.of(x); }}")
        elif kind == 1:
            lines.append(f"    private {a} {b} = new {a}({c});")
        elif kind == 2:
            lines.append(f"    void {a}() {{ {b}.apply({c}); }}")
        else:
            lines.append(f"    static final String {a} = \"{b}-{c}\";")
    lines.append("}")
    return "\n".join(lines)


def _plag_variant(rng: np.random.Generator, original: str, level: int, vocab: list[str], probs: np.ndarray) -> str:
    """Deterministic IR-Plag-style transformation at level L1..L6."""
    lines = original.split("\n")
    if level == 1:  # whitespace/comment edits only
        out = []
        for ln in lines:
            out.append(ln + ("  // edited" if rng.random() < 0.3 else ""))
            if rng.random() < 0.1:
                out.append("")
        return "\n".join(out)
    # token-level edits of increasing strength
    rename_frac = [0.0, 0.0, 0.1, 0.25, 0.45, 0.65, 0.9][level]
    toks = original.split(" ")
    uniq = sorted({t for t in toks if t.isidentifier() and t not in HOT_TOKENS and len(t) > 3})
    n_ren = int(len(uniq) * rename_frac)
    renames = {}
    if n_ren:
        victims = list(rng.choice(np.array(uniq, dtype=object), size=n_ren, replace=False))
        repl = np.array(vocab, dtype=object)[rng.choice(len(vocab), size=n_ren, p=probs)]
        renames = dict(zip(victims, repl))
    toks = [renames.get(t, t) for t in toks]
    body = " ".join(toks)
    if level >= 5:  # statement reorder
        lines = body.split("\n")
        mid = lines[2:-1]
        order = rng.permutation(len(mid))
        body = "\n".join(lines[:2] + [mid[i] for i in order] + lines[-1:])
    return body


def gen_corpus(n_docs: int = 1000, seed: int = 42, with_cases: bool = True) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(20_000)
    probs = _zipf_probs(len(vocab))
    repos, paths, commits, langs, contents = [], [], [], [], []
    langs_pool = ["py", "go", "rs", "c"]

    def add(repo: str, path: str, content: str, lang: str = "java"):
        repos.append(repo)
        paths.append(path)
        commits.append(hashlib.sha256(f"commit-{repo}-{path}-{seed}".encode()).hexdigest()[:40])
        langs.append(lang)
        contents.append(content)

    # ---- plagiarism conformance subset (layout mirrors the reference corpus)
    if with_cases:
        for k in range(1, 8):
            case_rng = np.random.default_rng(seed * 1000 + k)
            original = _doc_body(case_rng, vocab, probs, 20 + k * 3, f"Case{k}Main")
            add(f"cases/case-0{k}", "original/Main.java", original)
            for level in range(1, 7):
                for v in range(3):
                    var = _plag_variant(
                        np.random.default_rng(seed * 10_000 + k * 100 + level * 10 + v),
                        original, level, vocab, probs,
                    )
                    add(f"cases/case-0{k}", f"plagiarized/L{level}/{v:02d}/Main.java", var)
            for v in range(5):
                unrel = _doc_body(
                    np.random.default_rng(seed * 100_000 + k * 100 + v),
                    vocab, probs, 25, f"Other{k}x{v}",
                )
                add(f"cases/case-0{k}", f"non-plagiarized/{v:02d}/Main.java", unrel)

    # ---- bulk corpus (identifier draws vectorized across all docs —
    # one Zipf choice() call instead of one per doc)
    n_bulk = max(0, n_docs - len(repos))
    if n_bulk:
        n_lines_arr = np.where(
            rng.random(n_bulk) > 0.02,
            rng.integers(8, 60, size=n_bulk),
            rng.integers(200, 400, size=n_bulk),
        )
        is_dup = np.zeros(n_bulk, dtype=bool)
        is_dup[99::100] = True  # 1% exact duplicates
        total_ids = int((n_lines_arr[~is_dup] * 3).sum())
        all_ids = np.array(vocab, dtype=object)[rng.choice(len(vocab), size=total_ids, p=probs)]
        kinds_all = rng.integers(0, 4, size=int(n_lines_arr[~is_dup].sum()))
        lang_draw = rng.random(n_bulk)
        lang_pick = rng.integers(0, 4, size=n_bulk)
        off = 0
        koff = 0
        for i in range(n_bulk):
            if is_dup[i] and contents:
                j = int(rng.integers(0, len(contents)))
                add(f"org{i % 97:02d}/dup{i}", f"src/dup/Copy{i}.java", contents[j], langs[j])
                continue
            nl = int(n_lines_arr[i])
            ids = all_ids[off : off + nl * 3]
            kinds = kinds_all[koff : koff + nl]
            off += nl * 3
            koff += nl
            lines = [f"import core.{ids[0]};", f"public class Gen{i} {{"]
            for j in range(nl):
                a, b, c = ids[3 * j], ids[3 * j + 1], ids[3 * j + 2]
                k = kinds[j]
                if k == 0:
                    lines.append(f"    public static int {a}({b} x) {{ return {c}.of(x); }}")
                elif k == 1:
                    lines.append(f"    private {a} {b} = new {a}({c});")
                elif k == 2:
                    lines.append(f"    void {a}() {{ {b}.apply({c}); }}")
                else:
                    lines.append(f"    static final String {a} = \"{b}-{c}\";")
            lines.append("}")
            lang = "java" if lang_draw[i] < 0.9 else langs_pool[int(lang_pick[i])]
            add(f"org{i % 97:02d}/repo{i % 50:03d}", f"src/pkg{i % 17}/Gen{i}.java", "\n".join(lines), lang)

    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "content": pa.array(contents, type=pa.string()),
        }
    )


def gen_queries(corpus: pa.Table, n_keyword: int = 25, seed: int = 42, k: int = 10) -> list[tuple[int, str, int]]:
    """7 whole-file case-original queries + seeded keyword queries
    (≥3 hot-term-only) — FIXTURES.md §2."""
    rng = np.random.default_rng(seed + 7)
    vocab = _make_vocab(20_000)
    probs = _zipf_probs(len(vocab))
    queries: list[tuple[int, str, int]] = []
    paths = corpus["path"].to_pylist()
    repos = corpus["repo"].to_pylist()
    contents = corpus["content"].to_pylist()
    qid = 0
    for i, (r, p) in enumerate(zip(repos, paths)):
        if r.startswith("cases/") and p == "original/Main.java":
            queries.append((qid, contents[i], k))
            qid += 1
    for i in range(n_keyword):
        if i < 3:
            toks = list(rng.choice(np.array(HOT_TOKENS, dtype=object), size=3, replace=False))
        else:
            n_toks = int(rng.integers(2, 6))
            toks = list(np.array(vocab, dtype=object)[rng.choice(len(vocab), size=n_toks, p=probs)])
            if rng.random() < 0.3:
                toks.append(HOT_TOKENS[int(rng.integers(0, len(HOT_TOKENS)))])
        queries.append((qid, " ".join(toks), k))
        qid += 1
    return queries


def queries_table(queries: list[tuple[int, str, int]]) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([q[0] for q in queries], type=pa.int64()),
            "text": pa.array([q[1] for q in queries], type=pa.string()),
            "k": pa.array([q[2] for q in queries], type=pa.uint32()),
        }
    )
