from splatloc_tpu.core import transforms, sh, camera
from splatloc_tpu.core.camera import Camera
