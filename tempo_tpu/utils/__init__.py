from tempo_tpu.utils.dirs import init_directory
from tempo_tpu.utils.config import load_config, require_keys
from tempo_tpu.utils.env import load_dotenv

__all__ = ["init_directory", "load_config", "require_keys", "load_dotenv"]
