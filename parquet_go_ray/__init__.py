"""parquet_go_ray — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch with the encoding capabilities of segmentio/parquet-go
(reference at /root/reference, studied for semantics only — no code copied):

- codecs/   pure per-chunk encode/decode kernels (numpy / pyarrow, no Ray):
            PLAIN, RLE/bit-packed hybrid, dictionary, DELTA_BINARY_PACKED,
            DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY, BYTE_STREAM_SPLIT,
            FSST, plus the automatic codec selector.
- stages/   map_batches stages (encode / decode / verify actors).
- sources/  deterministic Common-Crawl-style web-page table generator +
            read helpers.
- state/    manifest / lineage records and checkpoint-resume logic.
- pipelines/ end-to-end Ray Data jobs (encode job, decode job, verify job,
            dedup / text-analysis / similarity pipelines).
- functions/ vectorized row-stream functions (text analysis, hashing,
            minhash/simhash, quality scoring).
"""

__version__ = "0.1.0"
