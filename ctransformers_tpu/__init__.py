import os as _os

if _os.environ.get("CT_PLATFORM"):
    # Pin the JAX platform before any array op. The JAX_PLATFORMS env var
    # alone is not reliable where a sitecustomize registers and pins an
    # accelerator plugin; the config update below always wins. Lets CLI
    # tools and tests run on CPU (CT_PLATFORM=cpu) without touching the
    # accelerator.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CT_PLATFORM"])

from .llm import LLM, Config
from .hub import AutoConfig, AutoModelForCausalLM, AutoTokenizer

__version__ = "0.1.0"
__all__ = ["Config", "LLM", "AutoConfig", "AutoModelForCausalLM", "AutoTokenizer"]
