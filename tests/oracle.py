"""Test-only oracle: the reference repo's pure-numpy gguf-py implementation,
used as the golden source of truth for quant round-trips (same pattern as the
reference's own gguf-py/tests/test_quants.py, which checks numpy vs libggml).

Never imported by the framework itself — tests only.
"""
import sys
import types

_REF = "/root/reference/gguf-py"


def load_reference_gguf():
    """Import the reference gguf-py package (stubbing its optional deps)."""
    if "sentencepiece" not in sys.modules:
        import importlib.machinery

        sp = types.ModuleType("sentencepiece")
        sp.SentencePieceProcessor = object
        # a real ModuleSpec so transformers' find_spec probing stays happy
        sp.__spec__ = importlib.machinery.ModuleSpec("sentencepiece", loader=None)
        sys.modules["sentencepiece"] = sp
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import gguf  # noqa: F401

    return gguf
