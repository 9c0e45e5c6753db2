"""One-off generator for the committed golden fixture (run from repo root).

Writes a tiny handcrafted change stream (every clean-stage edge case:
late/duplicate commits, malformed commit ids, null/empty keys and content,
additive metadata column from epoch 1) and the expected final table state as
JSON — the reference's checked-in golden-output style
(/root/reference/tests/test_transform_ls_to_cs.py:180-273), so replay
correctness is verifiable WITHOUT the DuckDB oracle. Regenerate only when
the engine's documented semantics change, and review the diff by hand.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

# (epoch, lsn, repo, path, commit, lang, content, metadata)
EVENTS = [
    # epoch 0 — plain inserts + an in-epoch duplicate key (latest wins)
    (0, 1, "alpha", "src/main.py", "c000000000001", "Python", "print('v1')", None),
    (0, 2, "alpha", "src/main.py", "c000000000002", "python", "print('v2')", None),
    (0, 3, "alpha", "README.md", "c000000000003", "markdown", "# alpha", None),
    (0, 4, "beta", "lib.rs", "c000000000004", "rs", "fn main() {}", None),
    (0, 5, "", "ignored.txt", "c000000000005", "text", "no repo", None),  # dropped: empty repo
    (0, 6, "beta", None, "c000000000006", "text", "no path", None),       # dropped: null path
    (0, 7, "beta", "lib.rs", "badcommit", "rs", "evil", None),            # dropped: malformed commit
    (0, 8, "gamma", "a.c", "c000000000008", "C", None, None),             # dropped: null content
    # epoch 1 — cross-epoch update, a LATE (older) commit that must lose,
    # and the additive metadata column appearing
    (1, 9, "alpha", "src/main.py", "c000000000009", "py", "print('v3')", '{"m":1}'),
    (1, 10, "beta", "lib.rs", "c000000000001", "rust", "fn late() {}", '{"m":2}'),  # loses to c..4
    (1, 11, "gamma", "a.c", "c000000000011", "c", "int x;", '{"m":3}'),
    (1, 12, "delta", "x.go", "c000000000012", "golang", "package x", None),
]

LANG_MAP = {
    "python": "python", "py": "python", "rs": "rust", "rust": "rust",
    "golang": "go", "go": "go", "c": "c", "markdown": "markdown",
    "text": "text",
}


def norm_lang(v):
    return LANG_MAP.get((v or "").strip().lower(), "unknown")


def write_stream():
    for epoch in (0, 1):
        rows = [e for e in EVENTS if e[0] == epoch]
        cols = {
            "lsn": pa.array([e[1] for e in rows], pa.int64()),
            "repo": pa.array([e[2] for e in rows], pa.string()),
            "lang": pa.array([e[5] for e in rows], pa.string()),
            "path": pa.array([e[3] for e in rows], pa.string()),
            "commit": pa.array([e[4] for e in rows], pa.string()),
            "content": pa.array([e[6] for e in rows], pa.string()),
        }
        if epoch >= 1:
            cols["metadata"] = pa.array([e[7] for e in rows], pa.string())
        d = os.path.join(HERE, "stream", f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table(cols), os.path.join(d, "part-0.parquet"))


def expected_final_state():
    # replay semantics: clean -> latest-commit-wins per (repo, path)
    latest = {}
    for epoch, lsn, repo, path, commit, lang, content, meta in EVENTS:
        if not repo or not path or content is None:
            continue
        if not (commit.startswith("c") and len(commit) == 13 and commit[1:].isdigit()):
            continue
        k = (repo, path)
        if k not in latest or commit > latest[k]["commit"]:
            latest[k] = {
                "repo": repo, "path": path, "lsn": lsn, "commit": commit,
                "lang": norm_lang(lang), "content": content,
                "metadata": meta, "epoch": epoch,
                "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
                "content_bytes": len(content.encode()),
            }
    rows = sorted(latest.values(), key=lambda r: (r["repo"], r["path"]))
    with open(os.path.join(HERE, "expected_final_state.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    return rows


if __name__ == "__main__":
    write_stream()
    rows = expected_final_state()
    print(f"wrote stream + {len(rows)} expected rows")
