"""cvcs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) remote-sensing segmentation framework.

Brand-new implementation of the capability set of theElandor/CVCS (the "GID15
Virtual Lab"): chunked patch-based training on full-scene satellite imagery,
a segmentation model zoo (UNet family, DeepLabV3 with ResNet/MobileNet
backbones, SegFormer, majority-vote ensembles), class-balanced losses,
confusion-matrix evaluation, checkpoint/resume, and whole-scene
sliding-window inference with border-corrected overlap stitching — all
designed TPU-first: NHWC bf16 compute on the MXU, device-resident data
augmentation, `jax.sharding.Mesh` + jit/shard_map parallelism (data
parallelism for training, halo-exchange spatial parallelism for scene
inference), and Pallas kernels for the fused hot ops.

Reference capability map: /root/repo/SURVEY.md (structural analysis of the
reference at /root/reference, cited throughout as `<file>:<line>`).
"""

__version__ = "0.1.0"

from cvcs_tpu.core import mesh, precision  # noqa: F401
from cvcs_tpu.core.mesh import MeshConfig, create_mesh, local_mesh  # noqa: F401
from cvcs_tpu.core.precision import Policy, DEFAULT_POLICY  # noqa: F401
from cvcs_tpu.data.geometry import TileGrid  # noqa: F401
from cvcs_tpu.data.reader import SceneDataset  # noqa: F401
from cvcs_tpu.data.loader import ChunkLoader  # noqa: F401
from cvcs_tpu.models.registry import build_model, MODEL_REGISTRY  # noqa: F401
