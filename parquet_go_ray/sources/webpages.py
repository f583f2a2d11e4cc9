"""Deterministic Common-Crawl-style web-page table generator.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Properties engineered for the engine (FIXTURES.md F1):
- url: unique per row; host Zipf-skewed over ~1k domains (skewed shuffle
  key); sorted-prefix friendly for DELTA_BYTE_ARRAY after a sort.
- warc_ts: near-monotonic microsecond timestamps with jitter and
  occasional jumps (DELTA_BINARY_PACKED sweet spot).
- text: Zipf word frequencies from a fixed vocabulary, heavy-tailed
  lengths (FSST target; byte-identical round-trip invariant is on this
  column per url).
- html: templated boilerplate wrapping the text (binary, larger).
- lang: ~40 codes, Zipf-skewed (en >> rest) — low-cardinality dictionary
  / RLE column and the salted-groupby skew case.

Generation is per-shard deterministic (seed = f(sf, shard)) and cached
under /tmp so tests/benches reuse it. No external data.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

LANGS = (
    "en en en en en en en en de fr es ru ja zh pt it nl pl tr ar cs sv el he "
    "ko vi id th fa ro hu da fi no uk bg hr sk lt sl et lv"
).split()

ROWS_PER_SHARD = 6250
CACHE_ROOT = "/tmp/graft_webpages"
BASE_TS = 1_577_836_800_000_000  # 2020-01-01 in microseconds

_VOCAB_SIZE = 4096


def _vocab() -> np.ndarray:
    rng = np.random.default_rng(1234)
    out = []
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    for i in range(_VOCAB_SIZE):
        n_syll = 1 + int(rng.integers(0, 4))
        word = "".join(
            consonants[int(rng.integers(0, len(consonants)))]
            + vowels[int(rng.integers(0, len(vowels)))]
            for _ in range(n_syll)
        )
        out.append(word)
    return np.array(out)


_VOCAB = None


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1), s)
    return p / p.sum()


def rows_for_sf(sf: float) -> int:
    return max(ROWS_PER_SHARD, int(round(sf * 1_000_000)))


def generate_shard(sf: float, shard: int, n_rows: int) -> pa.Table:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _vocab()
    rng = np.random.default_rng(abs(hash((round(sf * 1000), shard))) % (2**32))

    # lang: Zipf over codes
    lang_p = _zipf_probs(len(LANGS), 1.2)
    lang = rng.choice(np.array(LANGS), size=n_rows, p=lang_p)

    # urls: Zipf host + unique deterministic path
    host_ids = rng.choice(1000, size=n_rows, p=_zipf_probs(1000))
    tlds = np.array(["com", "org", "net", "io", "de", "co.uk"])
    row_ids = shard * 10_000_000 + np.arange(n_rows)
    words = _VOCAB[rng.integers(0, _VOCAB_SIZE, size=(n_rows, 2))]
    url = np.array(
        [
            f"https://www.{w0}{h:03d}.{tlds[h % len(tlds)]}/{w1}/p{r}"
            for w0, w1, h, r in zip(words[:, 0], words[:, 1], host_ids, row_ids)
        ]
    )

    # near-monotonic timestamps: base + shard offset + cumsum of jitter
    jitter = rng.exponential(50_000, n_rows).astype(np.int64)  # ~50ms mean
    jumps = (rng.random(n_rows) < 0.001) * rng.integers(0, 3_600_000_000, n_rows)
    ts = BASE_TS + shard * 86_400_000_000 + np.cumsum(jitter + jumps)

    # text: Zipf words, heavy-tailed length
    n_words = np.clip(rng.lognormal(3.6, 0.8, n_rows), 5, 800).astype(np.int64)
    total = int(n_words.sum())
    word_idx = rng.choice(_VOCAB_SIZE, size=total, p=_zipf_probs(_VOCAB_SIZE))
    flat = _VOCAB[word_idx]
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_words, out=bounds[1:])
    texts = [" ".join(flat[bounds[i] : bounds[i + 1]]) for i in range(n_rows)]

    html = [
        (
            "<html><head><title>%s</title><meta charset=\"utf-8\"/></head>"
            "<body><nav>home | about | contact</nav><article><p>%s</p>"
            "</article><footer>&copy; 2020 %s</footer></body></html>"
            % (t[:40], t, u)
        ).encode()
        for t, u in zip(texts, url)
    ]

    return pa.table(
        {
            "url": pa.array(url.tolist(), type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(html, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang.tolist(), type=pa.string()),
        },
        schema=SCHEMA,
    )


def _write_shard(args) -> None:
    sf, shard, rows, path = args
    table = generate_shard(sf, shard, rows)
    tmp = f"{path}.tmp{os.getpid()}"
    # small row groups let read_parquet split a shard into several
    # read tasks (override_num_blocks), so parallelism is not capped
    # by the shard count at test scale
    pq.write_table(table, tmp, compression="snappy", row_group_size=2048)
    os.replace(tmp, path)


def ensure(sf: float, root: str = CACHE_ROOT) -> str:
    """Generate (once) and return the shard directory for scale factor sf.
    Shards are seed-deterministic and independent, so generation fans out
    over a process pool (generating GB-scale inputs for scaling runs in
    seconds instead of minutes)."""
    n_rows = rows_for_sf(sf)
    n_shards = max(1, (n_rows + ROWS_PER_SHARD - 1) // ROWS_PER_SHARD)
    out = Path(root) / f"sf{sf:g}"
    done = out / "_SUCCESS"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    jobs = []
    for shard in range(n_shards):
        rows = min(ROWS_PER_SHARD, n_rows - shard * ROWS_PER_SHARD)
        if rows <= 0:
            break
        path = out / f"shard-{shard:05d}.parquet"
        if path.exists():
            continue
        jobs.append((sf, shard, rows, str(path)))
    if len(jobs) <= 2:
        for j in jobs:
            _write_shard(j)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as ex:
            list(ex.map(_write_shard, jobs, chunksize=4))
    done.write_text("ok")
    return str(out)


def shard_files(dir_path: str) -> list[str]:
    return sorted(
        str(p) for p in Path(dir_path).glob("*.parquet")
    )
