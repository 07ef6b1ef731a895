"""LLM orchestration (instruction parsing, object selection, captions)."""

from dream2real_tpu.lang.llm import LangModel  # noqa: F401
