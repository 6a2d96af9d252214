from splatloc_tpu.train import losses
from splatloc_tpu.train.mapping import MappingTrainer, FrameStore
