"""Task registry: string name -> task class.

Reference: utils/task_util.py:30-72 (task_map of 14 names / 12 classes).
Names match the reference exactly so CLI invocations carry over.
"""

from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask


def _registry():
    from omniisaacgymenvs_tpu.tasks.cartpole import CartpoleTask

    task_map = {
        "Cartpole": CartpoleTask,
    }
    from omniisaacgymenvs_tpu.tasks.ant import AntLocomotionTask
    from omniisaacgymenvs_tpu.tasks.anymal import AnymalTask
    from omniisaacgymenvs_tpu.tasks.humanoid import HumanoidLocomotionTask

    task_map["Ant"] = AntLocomotionTask
    task_map["Humanoid"] = HumanoidLocomotionTask
    task_map["Anymal"] = AnymalTask
    return task_map


def get_task(name: str, cfg: dict | None = None) -> RLTask:
    task_map = _registry()
    if name not in task_map:
        raise KeyError(
            f"unknown task {name!r}; available: {sorted(task_map)}"
        )
    return task_map[name](cfg)
