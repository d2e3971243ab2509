from cvcs_tpu.data.geometry import TileGrid  # noqa: F401
from cvcs_tpu.data.reader import SceneDataset  # noqa: F401
from cvcs_tpu.data.loader import ChunkLoader  # noqa: F401
