from .llm import LLM, Config
from .hub import AutoConfig, AutoModelForCausalLM, AutoTokenizer

__version__ = "0.1.0"
__all__ = ["Config", "LLM", "AutoConfig", "AutoModelForCausalLM", "AutoTokenizer"]
