"""Robot model specifications (data replacing the reference's USD assets).

Each module exports a `build_*() -> Model` factory. Masses/limits/drive
parameters mirror the reference robots (reference robots/articulations/*.py
configure drives on top of Nucleus USD assets; the geometric/inertial data
here is authored to match the published joint counts, gear tables, and
control semantics — SURVEY.md §2.2, §7.3 item 4).
"""

from omniisaacgymenvs_tpu.models.cartpole import build_cartpole
from omniisaacgymenvs_tpu.models.pendulum import build_pendulum, build_double_pendulum
from omniisaacgymenvs_tpu.models.ant import build_ant
from omniisaacgymenvs_tpu.models.humanoid import build_humanoid
