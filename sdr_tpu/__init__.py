"""sdr_tpu — TPU-native software-defined FM broadcast receiver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/Python SDR course project (mono/stereo FM + RDS from u8 IQ streams),
built for TPU hardware: pure functional block streaming under jit/scan,
MXU-mapped polyphase filtering, vmap/shard_map channel parallelism and
halo-exchange time parallelism over a device mesh.
"""

from sdr_tpu.config import MODES, ModeConfig, get_mode
from sdr_tpu.models.receiver import Receiver

__version__ = "0.1.0"

__all__ = ["MODES", "ModeConfig", "get_mode", "Receiver", "__version__"]
