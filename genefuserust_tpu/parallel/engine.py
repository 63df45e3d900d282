"""TPU batch engine (placeholder wiring — device kernels land in ops/).

Until the batched device pipeline is complete this delegates to the scalar
host oracle so the CLI is functional end-to-end; ops/ kernels replace the
internals incrementally with bit-identical results.
"""

from __future__ import annotations

from ..config import Settings
from ..core.scanner import HostEngine


class TpuEngine(HostEngine):
    def __init__(self, settings: Settings):
        self.settings = settings
