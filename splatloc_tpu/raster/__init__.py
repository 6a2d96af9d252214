from splatloc_tpu.raster.types import RasterConfig, RenderOutput
from splatloc_tpu.raster.api import rasterize, render, render_features
