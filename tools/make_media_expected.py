"""Build the pHash expected-value fixture for the media_phash_pairs
oracle (r10 verdict #4: give the media trio a VALUE oracle).

pHash is a numpy float64 DCT over decoded pixels — not SQL-expressible.
But the hash of a given payload is a pure function of its bytes, so the
oracle can LOOK IT UP: this tool runs the repo's own phash64 kernel over
every distinct payload the gate corpora can produce and writes
(content_md5, phash) to fixtures/media_expected_phash.parquet. The
oracle SQL joins md5(text) against it and re-derives the banded-Hamming
pair set with a brute-force bit_count(xor) <= 3 join — exactly
equivalent to the engine's 4x16-bit banded join by pigeonhole (Hamming
<= 3 over 4 bands guarantees one identical band).

Keying on the CONTENT hash (not doc_id / sf) makes one fixture serve
every corpus whose payloads it covers: clean sf0.001/0.01/0.1 and the
adversarial mutation. A corpus with a payload NOT in the fixture fails
the gate loudly (join drops the row -> rowcount mismatch) instead of
silently passing — rebuild with this tool when corpora change.

Usage: python tools/make_media_expected.py [--out fixtures/media_expected_phash.parquet]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from kaspi_etl_spark.llm.multimodal import phash64  # noqa: E402

DEFAULT_SRCS = [
    "/root/testdata/sf0.001/documents.parquet",
    "/root/testdata/sf0.01/documents.parquet",
    "/root/testdata/sf0.1/documents.parquet",
    ".advdata/sf0.01adv/documents.parquet",
]


def gather_texts(srcs: list[str]) -> set[str]:
    texts: set[str] = {""}  # NULL payloads hash as b'' on the Spark side
    for src in srcs:
        p = Path(src)
        if not p.exists():
            print(f"# skip missing {src}", file=sys.stderr)
            continue
        t = pq.read_table(p, columns=["doc_id", "text"])
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            s = text if text is not None else ""
            texts.add(s)
            if doc_id is not None and doc_id % 7 == 0:
                # llm_docs' near-duplicate variant (SQL_LLM_DOCS)
                texts.add(s + " padding tail words")
    return texts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixtures/media_expected_phash.parquet")
    ap.add_argument("--src", action="append", default=None)
    args = ap.parse_args()
    srcs = args.src or DEFAULT_SRCS

    texts = sorted(gather_texts(srcs))
    md5s, hashes = [], []
    for s in texts:
        b = s.encode("utf-8")
        md5s.append(hashlib.md5(b).hexdigest())
        hashes.append(phash64(b))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"content_md5": md5s, "phash": pa.array(hashes, pa.int64())}),
        out,
    )
    print(f"{len(texts)} payloads -> {out}")


if __name__ == "__main__":
    main()
