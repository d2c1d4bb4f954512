"""Device mesh construction — the TPU replacement for the reference's
Megatron ``parallel_state`` process-group factory (trainer.py:80-99).

One ``jax.sharding.Mesh`` with named axes replaces every NCCL process group:

- ``data``    pure data parallelism (DDP groups).
- ``fsdp``    parameter sharding (FSDP2/HSDP shard groups); also a second
              data-parallel axis (HSDP replicate x shard == data x fsdp).
- ``tensor``  Megatron-style tensor parallelism (plumbing-only upstream;
              first-class here since GSPMD makes it free).
- ``context`` sequence/context parallelism (the reference's main model-
              parallel axis; ring attention over ICI).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_PIPE = "pipe"
AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXIS_CONTEXT = "context"
# pipe is outermost: stage handoffs are the lowest-bandwidth traffic, the
# high-traffic axes (tensor, context) stay innermost == closest on ICI
MESH_AXES = (AXIS_PIPE, AXIS_DATA, AXIS_FSDP, AXIS_TENSOR, AXIS_CONTEXT)


@dataclasses.dataclass(frozen=True)
class InnerAxes:
    """Marker passed in place of a Mesh to code already running INSIDE a
    shard_map: "use collectives over these axis *names*, don't open another
    shard_map".  dit_block accepts it so pipeline stages (shard_mapped over
    ``pipe``) can run context-parallel attention over the ``context`` axis
    name and keep Pallas kernels local (pipeline_parallel.gpipe_scan with
    ``context_axis=``).  ``getattr(inner, "size", 1) == 1`` by design, so
    mesh-gated dispatchers (fused norms, attention wrappers) treat it as
    single-device and stay shard-local."""

    context: str | None = None
    context_size: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallelism degrees. -1 for ``data`` means "all remaining devices"."""

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    context: int = 1
    pipe: int = 1

    def resolve(self, num_devices: int) -> tuple[int, int, int, int, int]:
        fixed = self.fsdp * self.tensor * self.context * self.pipe
        data = self.data
        if data == -1:
            if num_devices % fixed:
                raise ValueError(
                    f"{num_devices} devices not divisible by "
                    f"pipe*fsdp*tensor*context={fixed}"
                )
            data = num_devices // fixed
        total = data * fixed
        if total != num_devices:
            raise ValueError(
                f"mesh {self.pipe}x{data}x{self.fsdp}x{self.tensor}x"
                f"{self.context} != {num_devices} devices"
            )
        return self.pipe, data, self.fsdp, self.tensor, self.context


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    """Build the 4-axis mesh. Axis order (data, fsdp, tensor, context) keeps
    the highest-traffic axes (tensor, context) innermost == closest in the
    physical ICI topology."""
    config = config or MeshConfig()
    devices = np.asarray(devices if devices is not None else jax.devices())
    shape = config.resolve(devices.size)
    return Mesh(devices.reshape(shape), MESH_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
