from splatloc_tpu.cli.config import load_config
