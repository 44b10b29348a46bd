"""Named embedder registry: the per-table model-binding seam.

The reference binds a sentence-transformer model per table —
paraphrase-multilingual-mpnet-base-v2 for Wikipedia, instructor-xl with an
instruction prefix for ArXiv (/root/reference/app/backend/constants/
myscale_tables.py:90-92,117-120; chat_bot/tools.py:53-59). Those models
aren't in this container, so every name resolves to the deterministic
hash-stub factory until a real one is registered; a deployment calls::

    register_embedder("mpnet", lambda dim: my_sentence_transformer_udf)

once at startup and every TableConfig naming that model picks it up — the
stub is a swappable default, not a hardcoded path. Factories return an
Arrow pandas UDF ``(text column) -> array<float>``; anything they capture
is pickled by value to workers (broadcast the model handle, never a
module-global reference — see the pickling rule in project notes).
"""

from __future__ import annotations

from collections.abc import Callable

from chatdata_spark.functions.vector import make_embed_text_udf

# name -> factory(dim) -> pandas UDF column transformer
_EMBEDDERS: dict[str, Callable[[int], object]] = {}


def register_embedder(name: str, factory: Callable[[int], object]) -> None:
    _EMBEDDERS[name] = factory


def unregister_embedder(name: str) -> None:
    _EMBEDDERS.pop(name, None)


def embedder_udf(name: str, dim: int):
    """Resolve ``name`` to a UDF; unregistered names fall back to the
    deterministic hash stub (the only embedder guaranteed present)."""
    factory = _EMBEDDERS.get(name, make_embed_text_udf)
    return factory(dim)


def registered() -> tuple[str, ...]:
    return tuple(_EMBEDDERS)
