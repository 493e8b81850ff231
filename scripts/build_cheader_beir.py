"""Build a second real-text BEIR-layout benchmark from C/C++ header docs.

VERDICT r3 next #8: the round-3 quality story rides one corpus (Python
docstrings). This builds an independent in-image domain with a different
register — doxygen/javadoc-style API documentation from /usr/include
(liblzma, libpng, zstd, libstdc++, glib, ...): terse imperative briefs,
parameter/return contracts, C/C++ identifiers — and a different authorship
population than Python docstrings. Task shape mirrors the reference's
title->body datasets (S2ORC_title_abstract et al., config/data/single_dataset/)
and scripts/build_docstring_beir.py:

  query  = doc-comment brief (@brief tag or first sentence)
  doc    = remaining doc text (params/returns/details) + the declaration
  qrel   = identity
  title  = declared identifier (best-effort) + header file

Filters: license/file-header blocks dropped, briefs 4-40 words, bodies
>= 25 words, dedup bodies, ambiguous briefs (same brief on >1 body) dropped.
Split deterministic by id hash; eval queries search the FULL corpus. Train
rows carry BM25 hard negatives (CPU-safe: pass --cpu while the TPU is busy).

Usage:
  python scripts/build_cheader_beir.py --out /tmp/cheader_beir [--cpu]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:  # BM25 mining off-TPU while the chip is busy
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

ROOTS = ["/usr/include"]
EXTS = (".h", ".hpp", ".hh", ".tcc")

# Proper comment tokenization: scan ALL /*...*/ blocks in file order (a
# regex anchored at '/**' alone can start matching INSIDE an outer comment
# and swallow code + the next comment). Doc blocks are '/**' or '/*!'
# (doxygen / zstd-Qt style); '/**<' trailing member docs are skipped.
_COMMENT = re.compile(r"/\*.*?\*/", re.DOTALL)
_DECL_AFTER = re.compile(r"\s*([^;{}/#]{3,400}?)[;{]")
_BRIEF = re.compile(r"[@\\]brief\s+(.*?)(?=\n\s*\*?\s*\n|[@\\][a-z]+|$)",
                    re.DOTALL)
_TAG = re.compile(r"[@\\](param(?:\[[a-z,]+\])?|tparam|return[s]?|retval|"
                  r"throws?|exception|see|sa|note|warning|since|deprecated|"
                  r"pre|post|code|endcode|ingroup|ref|c|p|a|e|em|b)\b")
_WS = re.compile(r"\s+")
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_LICENSE = re.compile(r"copyright|license|warranty|redistribut", re.IGNORECASE)
_SKIP_BLOCK = re.compile(r"[@\\](file|defgroup|addtogroup|mainpage|page)\b")

C_KEYWORDS = {
    "if", "else", "for", "while", "do", "return", "switch", "case", "sizeof",
    "const", "static", "inline", "extern", "struct", "union", "enum",
    "typedef", "unsigned", "signed", "int", "long", "short", "char", "float",
    "double", "void", "bool", "class", "template", "typename", "namespace",
    "operator", "noexcept", "constexpr", "virtual", "explicit", "public",
    "private", "protected", "auto", "using", "requires", "concept",
}


def strip_stars(comment: str) -> str:
    lines = []
    for ln in comment.split("\n"):
        ln = ln.strip()
        if ln.startswith("*"):
            ln = ln[1:]
        lines.append(ln)
    return "\n".join(lines)


def clean(text: str, max_words: int = 300) -> str:
    text = _TAG.sub(" ", text)
    text = _WS.sub(" ", text).strip().lstrip(".: ")
    return " ".join(text.split()[:max_words])


def alpha_ratio(s: str) -> float:
    if not s:
        return 0.0
    return sum(c.isalpha() or c.isspace() for c in s) / len(s)


def decl_name(decl: str) -> str:
    """Best-effort declared identifier: last non-keyword identifier before
    '(' if any, else the last non-keyword identifier."""
    decl = decl.split("(")[0] if "(" in decl else decl
    names = [n for n in _IDENT.findall(decl) if n not in C_KEYWORDS]
    return names[-1] if names else ""


def first_sentence(text: str) -> str:
    # stop at ". " / ".\n" / blank line / first doxygen tag
    cut = re.split(r"\.(?:\s|$)|\n\s*\n|[@\\][a-z]+", text, maxsplit=1)[0]
    return cut.strip()


def harvest() -> list[dict]:
    rows, seen_bodies = [], set()
    for root in ROOTS:
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if not fn.endswith(EXTS):
                    continue
                path = os.path.join(dirpath, fn)
                try:
                    text = open(path, encoding="utf-8", errors="ignore").read()
                except OSError:
                    continue
                rel = os.path.relpath(path, root)
                for m in _COMMENT.finditer(text):
                    block = m.group(0)
                    if not (block.startswith("/**") or
                            block.startswith("/*!")) or \
                            block.startswith("/**<"):
                        continue
                    raw_comment = block[3:-2]
                    dm = _DECL_AFTER.match(text, m.end())
                    decl = dm.group(1) if dm else ""
                    if _LICENSE.search(raw_comment) or \
                            _SKIP_BLOCK.search(raw_comment):
                        continue
                    comment = strip_stars(raw_comment)
                    bm = _BRIEF.search(comment)
                    if bm:
                        brief = clean(bm.group(1), max_words=48)
                        rest = comment[:bm.start()] + comment[bm.end():]
                    else:
                        brief = clean(first_sentence(comment), max_words=48)
                        rest = comment[len(first_sentence(comment)):]
                    decl_txt = _WS.sub(" ", decl).strip()
                    if len(decl_txt.split()) > 48:
                        continue
                    body = clean(rest)
                    if not (4 <= len(brief.split()) <= 40):
                        continue
                    if len(body.split()) < 25:
                        continue
                    if alpha_ratio(brief) < 0.72 or alpha_ratio(body) < 0.62:
                        continue
                    full_body = (body + " | " + decl_txt) if decl_txt else body
                    h = hashlib.sha1(full_body.encode()).hexdigest()[:16]
                    if h in seen_bodies:
                        continue
                    seen_bodies.add(h)
                    name = decl_name(decl)
                    title = f"{rel}:{name}" if name else rel
                    rows.append({"_id": h, "title": title, "summary": brief,
                                 "text": full_body})
    by_summary: dict[str, int] = {}
    for r in rows:
        by_summary[r["summary"]] = by_summary.get(r["summary"], 0) + 1
    return [r for r in rows if by_summary[r["summary"]] == 1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-test", type=int, default=1500)
    ap.add_argument("--test-mod", type=int, default=5,
                    help="1-in-N docs become test queries (hash split); this "
                         "corpus is ~3.5k docs, so a 20%% split keeps the "
                         "query count statistically useful (~700)")
    ap.add_argument("--hard-negatives", type=int, default=12)
    ap.add_argument("--max-docs", type=int, default=0, help="cap corpus (debug)")
    args = ap.parse_args()

    print("harvesting C/C++ header doc comments ...", flush=True)
    rows = harvest()
    if args.max_docs:
        rows = rows[: args.max_docs]
    print(f"kept {len(rows)} unique (brief, body) pairs", flush=True)

    def split_of(r):
        return "test" if int(r["_id"], 16) % args.test_mod == 0 else "train"

    test_rows = [r for r in rows if split_of(r) == "test"][: args.max_test]
    test_ids = {r["_id"] for r in test_rows}
    train_rows = [r for r in rows if r["_id"] not in test_ids]

    os.makedirs(os.path.join(args.out, "qrels"), exist_ok=True)
    with open(os.path.join(args.out, "corpus.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({"_id": r["_id"], "title": r["title"],
                                "text": r["text"]}) + "\n")
    with open(os.path.join(args.out, "queries.jsonl"), "w") as f:
        for r in test_rows:
            f.write(json.dumps({"_id": "q" + r["_id"],
                                "text": r["summary"]}) + "\n")
    with open(os.path.join(args.out, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for r in test_rows:
            f.write(f"q{r['_id']}\t{r['_id']}\t1\n")

    print("mining BM25 hard negatives ...", flush=True)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from build_docstring_beir import mine_hard_negatives

    by_id = {r["_id"]: r for r in rows}
    negs = mine_hard_negatives(rows, train_rows, args.hard_negatives)
    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)
    with open(os.path.join(args.out, "train", "docstrings.jsonl"), "w") as f:
        for r, neg_ids in zip(train_rows, negs):
            f.write(json.dumps({
                "query": r["summary"],
                "positive_passages": [{"docid": r["_id"], "title": r["title"],
                                       "text": r["text"]}],
                "negative_passages": [
                    {"docid": n, "title": by_id[n]["title"],
                     "text": by_id[n]["text"]} for n in neg_ids],
            }) + "\n")
    stats = {"corpus": len(rows), "test_queries": len(test_rows),
             "train_rows": len(train_rows),
             "hard_negatives_per_row": args.hard_negatives}
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
