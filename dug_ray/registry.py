"""User-extension registry: pluggable parsers + annotators (SURVEY.md §2.10).

The reference exposes pluggy hookspecs ``define_parsers`` /
``define_annotators`` (``/root/reference/src/dug/hookspecs.py:12-22``) with
a name-keyed registry (``core/parsers/__init__.py:24-53``) that third-party
packages extend via entry points. The Ray-Data equivalent: a parser is a
``Dataset -> Dataset`` callable over the interleaved documents table; an
annotator is a batch-callable factory (class or function) usable in
``map_batches``. Register with the decorators; look up by name exactly like
``get_parser`` (``parsers/__init__.py:63-75`` raises on unknown names)."""

from __future__ import annotations

from typing import Callable

import ray.data

_PARSERS: dict[str, Callable[[ray.data.Dataset], ray.data.Dataset]] = {}
_ANNOTATORS: dict[str, Callable] = {}
_MENTION_FILTERS: dict[str, Callable] = {}


def register_parser(name: str):
    def deco(fn):
        _PARSERS[name] = fn
        return fn
    return deco


def register_annotator(name: str):
    def deco(factory):
        _ANNOTATORS[name] = factory
        return factory
    return deco


def register_mention_filter(name: str):
    """M7 hook — the bagel LLM filter slot (``sapbert_annotator.py:16-52``:
    given the text + candidate identifiers, keep a subset). A registered
    factory returns a callable ``DataFrame -> DataFrame`` that row-filters
    candidate mention rows (columns include term, curie, score, doc/element
    ids); it runs inside the linker actor, constructed once per worker like
    the reference's per-session BagelWrapper. Default-off, matching the
    reference config (``config.py:53``)."""
    def deco(factory):
        _MENTION_FILTERS[name] = factory
        return factory
    return deco


def get_mention_filter(name: str):
    if name not in _MENTION_FILTERS:
        raise KeyError(f"Cannot find mention filter of type '{name}'")
    return _MENTION_FILTERS[name]


def get_parser(name: str):
    if name not in _PARSERS:
        raise KeyError(f"Cannot find parser of type '{name}'")  # parsers/__init__.py:74 wording
    return _PARSERS[name]


def get_annotator(name: str):
    if name not in _ANNOTATORS:
        raise KeyError(f"Cannot find annotator of type '{name}'")
    return _ANNOTATORS[name]


def parser_names() -> list[str]:
    return sorted(_PARSERS)


def _register_defaults() -> None:
    from dug_ray.stages.annotate import DictionaryNER, ner_batch
    from dug_ray.stages.link import LinkNormalize, link_batch
    from dug_ray.stages.parse import PARSER_BRANDS, parse_elements

    for brand in PARSER_BRANDS:
        _PARSERS[brand] = (lambda docs, b=brand: parse_elements(docs, data_type=b))
    _ANNOTATORS["dictionary-ner"] = DictionaryNER
    _ANNOTATORS["dictionary-ner-stateless"] = ner_batch
    _ANNOTATORS["link-normalize"] = LinkNormalize
    _ANNOTATORS["link-normalize-stateless"] = link_batch


_register_defaults()
