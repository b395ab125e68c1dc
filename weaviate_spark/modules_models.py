"""Real embedding-model vectorizers behind the module registry
(VERDICT r06 ask #6; reference: usecases/modules — VectorFromInput
routes a collection's configured vectorizer module; modules/
text2vec-transformers serves the actual model).

The registry contract is unchanged from the deterministic dummies
(modules.py): a vectorizer is a factory returning an Arrow-batched
pandas UDF producing ``array<float>``. The factories here bind PUBLIC
model runtimes that are OPTIONAL EXTRAS — none are baked into this
container, so every import is gated and the factory raises a clear
error naming the missing dependency instead of failing at import time.
Tests exercise the plumbing with a fake runtime and skip the real-model
path offline (tests/test_modules_models.py).

Plan shape: the model loads ONCE PER EXECUTOR via the iterator-of-
batches UDF form (a per-row or per-batch load would dominate runtime);
inference is Arrow-batched. On a 1000-executor cluster each executor
holds one model instance and streams its partitions through it —
exactly how the reference's transformers container amortizes model
load across requests.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd

from weaviate_spark.modules import register_vectorizer


def _load_sentence_transformer(model_name: str):
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except ImportError as exc:  # pragma: no cover - optional extra
        raise ImportError(
            "text2vec-transformers needs the optional extra "
            "'sentence-transformers' (pip install sentence-transformers); "
            "this container ships only the deterministic text2vec-dummy"
        ) from exc
    return SentenceTransformer(model_name)


def sentence_transformer_udf(
    model_name: str = "all-MiniLM-L6-v2",
    batch_size: int = 64,
    normalize: bool = True,
    _loader: Optional[Callable] = None,
):
    """pandas UDF embedding a text column with a sentence-transformers
    model. ``_loader`` is the test seam: a zero-arg callable returning
    an object with ``.encode(list[str], batch_size=, normalize_embeddings=)``
    (the public SentenceTransformer surface) — production leaves it
    None and loads the real model once per executor."""
    from pyspark.sql.functions import pandas_udf

    loader = _loader or (lambda: _load_sentence_transformer(model_name))

    @pandas_udf("array<float>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = loader()  # once per executor task stream, not per batch
        for batch in batches:
            texts = ["" if t is None else str(t) for t in batch]
            vecs = model.encode(
                texts, batch_size=batch_size,
                normalize_embeddings=normalize,
            )
            yield pd.Series([[float(x) for x in v] for v in vecs])

    return _embed


@register_vectorizer("text2vec-transformers")
def text2vec_transformers(dim: int = 0, model_name: str = "all-MiniLM-L6-v2"):
    """Registry entry matching the dummies' (dim) factory signature —
    ``dim`` is ignored (the model defines it); kept so
    ``vectorize_column(..., module="text2vec-transformers")`` works
    unchanged."""
    return sentence_transformer_udf(model_name)


def _load_cross_encoder(model_name: str):
    try:
        from sentence_transformers import CrossEncoder  # type: ignore
    except ImportError as exc:  # pragma: no cover - optional extra
        raise ImportError(
            "reranker-transformers needs the optional extra "
            "'sentence-transformers' (pip install sentence-transformers); "
            "this container ships only the deterministic reranker-dummy"
        ) from exc
    return CrossEncoder(model_name)


def cross_encoder_rerank_udf(
    query: str,
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2",
    batch_size: int = 64,
    _loader: Optional[Callable] = None,
):
    """pandas UDF scoring (query, doc) pairs with a cross-encoder — the
    real-model counterpart of reranker-dummy (reference:
    modules/reranker-transformers, which posts the same pair list to
    its inference container). Same factory contract as the dummy:
    ``RERANKERS[name](query)`` returns a ``double`` UDF over doc text,
    so search_post's rerank stage needs no changes.

    ``_loader`` is the test seam: a zero-arg callable returning an
    object with ``.predict(list[(query, doc)], batch_size=)`` (the
    public CrossEncoder surface). Production leaves it None; the model
    loads once per executor task stream (iterator-of-batches form) and
    scores Arrow batches — the rerank window is top-k sized, so at
    cluster scale this stage is a few model batches per query, never a
    corpus scan."""
    from pyspark.sql.functions import pandas_udf

    loader = _loader or (lambda: _load_cross_encoder(model_name))
    q = "" if query is None else str(query)

    @pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = loader()  # once per executor task stream, not per batch
        for batch in batches:
            pairs = [(q, "" if t is None else str(t)) for t in batch]
            scores = model.predict(pairs, batch_size=batch_size)
            yield pd.Series([float(s) for s in scores])

    return _score


def _register_reranker_transformers() -> None:
    from weaviate_spark.modules import RERANKERS

    RERANKERS["reranker-transformers"] = (
        lambda query: cross_encoder_rerank_udf(query)
    )


_register_reranker_transformers()


def _load_text2text_pipeline(model_name: str):
    try:
        from transformers import pipeline  # type: ignore
    except ImportError as exc:  # pragma: no cover - optional extra
        raise ImportError(
            "generative-transformers needs the optional extra "
            "'transformers' (pip install transformers); this container "
            "ships only the deterministic generative-dummy"
        ) from exc
    return pipeline("text2text-generation", model=model_name)


def text2text_generate_udf(
    prompt_template: str,
    model_name: str = "google/flan-t5-small",
    max_new_tokens: int = 64,
    batch_size: int = 16,
    _loader: Optional[Callable] = None,
):
    """pandas UDF running a seq2seq model over per-result prompts — the
    real-model counterpart of generative-dummy (reference:
    modules/generative-* single-prompt mode, which formats {text} into
    the prompt per result and calls the model service). Same factory
    contract: ``GENERATIVES[name](prompt_template)`` returns a string
    UDF over doc text.

    ``_loader`` is the test seam: a zero-arg callable returning an
    object callable as ``model(list[str], max_new_tokens=...) ->
    list[{"generated_text": str}]`` (the public transformers pipeline
    surface). The model loads once per executor task stream; the
    generate stage runs over the fetched top-k window only, so at
    cluster scale this is a few model batches per query — never a
    corpus scan."""
    from pyspark.sql.functions import pandas_udf

    loader = _loader or (lambda: _load_text2text_pipeline(model_name))
    tmpl = prompt_template or "{text}"

    @pandas_udf("string")
    def _gen(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = loader()  # once per executor task stream, not per batch
        for batch in batches:
            prompts = [tmpl.replace("{text}", "" if t is None else str(t))
                       for t in batch]
            outs = []
            for lo in range(0, len(prompts), batch_size):
                outs.extend(model(prompts[lo:lo + batch_size],
                                  max_new_tokens=max_new_tokens))
            yield pd.Series([o["generated_text"] for o in outs])

    return _gen


def _register_generative_transformers() -> None:
    from weaviate_spark.modules import GENERATIVES

    GENERATIVES["generative-transformers"] = (
        lambda prompt_template: text2text_generate_udf(prompt_template)
    )


_register_generative_transformers()


def onnx_cross_encoder_udf(
    query: str,
    model_path: str,
    tokenizer_json: str,
    max_len: int = 256,
):
    """ONNX-runtime cross-encoder variant (the no-torch deployment
    path): the exported model takes the tokenizer's PAIR encoding
    (query ++ doc with segment ids) and returns one logit per pair.
    Gated on the optional 'onnxruntime' + 'tokenizers' extras."""
    try:
        import numpy as np
        import onnxruntime  # type: ignore
        from tokenizers import Tokenizer  # type: ignore
    except ImportError as exc:  # pragma: no cover - optional extra
        raise ImportError(
            "onnx_cross_encoder_udf needs the optional extras "
            "'onnxruntime' and 'tokenizers'"
        ) from exc
    from pyspark.sql.functions import pandas_udf

    q = "" if query is None else str(query)

    @pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        sess = onnxruntime.InferenceSession(model_path)
        tok = Tokenizer.from_file(tokenizer_json)
        tok.enable_truncation(max_length=max_len)
        tok.enable_padding()
        for batch in batches:
            encs = tok.encode_batch(
                [(q, "" if t is None else str(t)) for t in batch])
            feeds = {
                "input_ids": np.array([e.ids for e in encs], dtype=np.int64),
                "attention_mask": np.array(
                    [e.attention_mask for e in encs], dtype=np.int64),
            }
            if any(i.name == "token_type_ids" for i in sess.get_inputs()):
                feeds["token_type_ids"] = np.array(
                    [e.type_ids for e in encs], dtype=np.int64)
            logits = sess.run(None, feeds)[0]
            yield pd.Series([float(v[0]) for v in logits])

    return _score


def onnx_embed_udf(model_path: str, tokenizer_json: str, max_len: int = 256):
    """ONNX-runtime variant (the no-torch deployment path): mean-pooled
    last-hidden-state embeddings from an exported transformer. Gated on
    the optional 'onnxruntime' + 'tokenizers' extras."""
    try:
        import numpy as np
        import onnxruntime  # type: ignore
        from tokenizers import Tokenizer  # type: ignore
    except ImportError as exc:  # pragma: no cover - optional extra
        raise ImportError(
            "onnx_embed_udf needs the optional extras 'onnxruntime' and "
            "'tokenizers'"
        ) from exc
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        sess = onnxruntime.InferenceSession(model_path)
        tok = Tokenizer.from_file(tokenizer_json)
        tok.enable_truncation(max_length=max_len)
        tok.enable_padding()
        for batch in batches:
            encs = tok.encode_batch(["" if t is None else str(t) for t in batch])
            ids = np.array([e.ids for e in encs], dtype=np.int64)
            mask = np.array([e.attention_mask for e in encs], dtype=np.int64)
            hidden = sess.run(
                None, {"input_ids": ids, "attention_mask": mask})[0]
            m = mask[..., None].astype(hidden.dtype)
            pooled = (hidden * m).sum(axis=1) / m.sum(axis=1).clip(min=1)
            norms = np.linalg.norm(pooled, axis=1, keepdims=True)
            pooled = pooled / np.where(norms == 0, 1.0, norms)
            yield pd.Series([[float(x) for x in v] for v in pooled])

    return _embed
