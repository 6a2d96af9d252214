from splatloc_tpu.data.datasets import (ReplicaDataset, Scenes12Dataset,
                                        load_dataset)
