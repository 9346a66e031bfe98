"""NER annotation stage: elements -> candidate mentions (actor pool).

Re-expresses dug's Monarch/SapBERT annotation chain (SURVEY.md §2.2 M2-M6)
as a stateful ``map_batches`` actor:

- text preprocessing / debreviator (``monarch_annotator.py:155-172``,
  default dict ``config.py:35-40``) — substring replacement applied with
  pyarrow kernels before tokenization;
- dictionary NER (the stand-in for the Monarch SciGraph annotator HTTP call,
  ``monarch_annotator.py:113-153``): whitespace tokens are matched against
  the lexicon; one token may yield several candidate identifiers, mirroring
  the span x token expansion of the reference's 7-identifier "heart attack"
  fixture (``tests/unit/test_annotators.py:26-41``);
- linker candidate scores ride along (SapBERT top-k scoring,
  ``sapbert_annotator.py:233-320``); the >= 0.8 threshold filter is applied
  downstream in stages/link.py.

Scale notes: the lexicon is actor state built ONCE in ``__init__`` (per the
actor-pool rule; at cluster scale it arrives via ``ray.put`` broadcast — the
constructor accepts an object ref). The batch body is vectorized: pyarrow
``split_pattern`` + flat token explode + one pandas hash-merge against the
lexicon; no per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dug_ray import ontology
from dug_ray.io import SPAN_TOKENS

#: default abbreviation-expansion dict (config.py:35-40: {"bmi": "body mass
#: index", "_": " "}); identity on the synthetic corpus.
DEFAULT_PREPROCESSOR: dict[str, str] = {}

MENTION_COLUMNS = [
    "doc_id", "element_id", "collection_id", "span_offset", "tok_pos",
    "term", "curie", "label", "category", "score",
]


def preprocess_text(col: pa.ChunkedArray | pa.Array, replacements: dict[str, str]) -> pa.Array | pa.ChunkedArray:
    """Debreviator (M2): ordered substring replacement, vectorized."""
    for pat, rep in replacements.items():
        col = pc.replace_substring(col, pattern=pat, replacement=rep)
    return col


class DictionaryNER:
    """Actor-pool NER stage: ``map_batches(DictionaryNER, concurrency=N)``.

    ``lexicon_ref`` may be a ``ray.ObjectRef`` to a broadcast lexicon
    DataFrame (the 100 TB pattern: ``ray.put`` once on the driver, fetched
    once per actor), else the module-level synthetic lexicon is used.

    CONTRACT: ``tok_pos`` is the 1-based global position in the
    POST-preprocessor tokenization. With the identity default preprocessor
    (the reference ships debreviation disabled) this equals the raw-text
    tokenization that the DuckDB oracles reproduce; a replacement that
    changes token counts shifts positions relative to raw text — callers
    enabling a non-identity debreviator must not mix its mention positions
    with raw-text-derived ones.
    """

    def __init__(self, lexicon_ref=None, preprocessor: dict[str, str] | None = None):
        lex = ray.get(lexicon_ref) if lexicon_ref is not None else ontology.lexicon_df()
        # index by term for the merge; keep dtypes tight
        self.lexicon = lex.rename(columns={"term": "_term"})
        self.preprocessor = dict(DEFAULT_PREPROCESSOR if preprocessor is None else preprocessor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        desc = preprocess_text(batch["element_desc"], self.preprocessor)
        tokens = pc.split_pattern(desc, " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        flat = tokens.flatten()
        # 0-based position of each token within its span text (robust to any
        # non-zero list-array slice offset: recompute starts from lengths)
        lengths = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos_in_span = np.arange(len(flat)) - starts[parent]

        # dictionary-encode the token stream so the lexicon join is a cheap
        # int-code merge on the (tiny) per-batch vocabulary instead of a
        # string merge over millions of tokens
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vocab = pd.DataFrame({"_code": np.arange(len(enc.dictionary)),
                              "_term": enc.dictionary.to_pandas()})
        lex_codes = vocab.merge(self.lexicon, on="_term", how="inner", sort=False)
        tok = pd.DataFrame({"_parent": parent, "_code": codes, "_pos": pos_in_span})
        hits = tok.merge(lex_codes, on="_code", how="inner", sort=False)
        if len(hits) == 0:
            return pa.table({c: pa.array([], type=(pa.int32() if c in ("span_offset", "tok_pos")
                                                  else pa.float64() if c == "score" else pa.string()))
                             for c in MENTION_COLUMNS})

        take = pa.array(hits["_parent"].to_numpy(), type=pa.int64())
        chunk_idx = pc.take(batch["chunk_idx"], take).to_numpy(zero_copy_only=False).astype(np.int64)
        # 1-based global token position in the doc's full text (io.py contract)
        tok_pos = chunk_idx * SPAN_TOKENS + hits["_pos"].to_numpy() + 1
        return pa.table({
            "doc_id": pc.take(batch["doc_id"], take),
            "element_id": pc.take(batch["element_id"], take),
            "collection_id": pc.take(batch["collection_id"], take),
            "span_offset": pc.take(batch["span_offset"], take),
            "tok_pos": pa.array(tok_pos, type=pa.int32()),
            "term": pa.array(hits["_term"], type=pa.string()),
            "curie": pa.array(hits["curie"], type=pa.string()),
            "label": pa.array(hits["label"], type=pa.string()),
            "category": pa.array(hits["category"], type=pa.string()),
            "score": pa.array(hits["score"], type=pa.float64()),
        })


_NER_SINGLETON: DictionaryNER | None = None


def ner_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the NER stage: state is a per-worker-process
    singleton (worker processes are reused across tasks, so the lexicon is
    built once per process — same amortization as an actor, but elastic
    task scheduling and no pool spin-up per execution). Use the actor-pool
    form when the state must come from a broadcast object ref."""
    global _NER_SINGLETON
    if _NER_SINGLETON is None:
        _NER_SINGLETON = DictionaryNER()
    return _NER_SINGLETON(batch)


def default_pool_size(frac: float = 1.0) -> int:
    """Fixed actor-pool size as a fraction of cluster CPUs.

    Fixed (not autoscaling (1, N)): the streaming executor ramps autoscaled
    pools on backlog *gradually*, which leaves most cores idle for the first
    tens of seconds — measured <40% utilization on short jobs. All actors
    start up front; ``frac`` splits the node between pools that run
    concurrently in one pipeline."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - before init, fall back
        ncpu = 8
    # floor of 1, not 2: on tiny clusters two pools flooring at 2 would
    # reserve every CPU and starve the read/write tasks (observed deadlock
    # at num_cpus=4)
    return max(1, int(ncpu * frac))


def annotate_elements(elements: ray.data.Dataset, *, concurrency: int | tuple | None = None,
                      batch_size: int | None = None, lexicon_ref=None) -> ray.data.Dataset:
    """elements -> candidate mentions via the NER actor pool."""
    return elements.map_batches(
        DictionaryNER,
        fn_constructor_kwargs={"lexicon_ref": lexicon_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(0.6),
    )
