from splatloc_tpu.fields.hashgrid import HashGridConfig, init_hashgrid, encode
from splatloc_tpu.fields.decoder import (FeatureFieldConfig, init_decoder,
                                         decode, decode_jit, cosine_loss)
