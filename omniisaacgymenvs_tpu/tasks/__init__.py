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
    from omniisaacgymenvs_tpu.tasks.ball_balance import BallBalanceTask
    from omniisaacgymenvs_tpu.tasks.anymal import AnymalTask
    from omniisaacgymenvs_tpu.tasks.anymal_terrain import AnymalTerrainTask
    from omniisaacgymenvs_tpu.tasks.crazyflie import CrazyflieTask
    from omniisaacgymenvs_tpu.tasks.allegro_hand import AllegroHandTask
    from omniisaacgymenvs_tpu.tasks.franka_cabinet import FrankaCabinetTask
    from omniisaacgymenvs_tpu.tasks.shadow_hand import ShadowHandTask
    from omniisaacgymenvs_tpu.tasks.humanoid import HumanoidLocomotionTask
    from omniisaacgymenvs_tpu.tasks.ingenuity import IngenuityTask
    from omniisaacgymenvs_tpu.tasks.quadcopter import QuadcopterTask

    task_map["Ant"] = AntLocomotionTask
    task_map["BallBalance"] = BallBalanceTask
    task_map["Humanoid"] = HumanoidLocomotionTask
    task_map["Anymal"] = AnymalTask
    task_map["AnymalTerrain"] = AnymalTerrainTask
    task_map["Ingenuity"] = IngenuityTask
    task_map["Quadcopter"] = QuadcopterTask
    task_map["Crazyflie"] = CrazyflieTask
    task_map["FrankaCabinet"] = FrankaCabinetTask
    task_map["AllegroHand"] = AllegroHandTask
    task_map["ShadowHand"] = ShadowHandTask

    def _openai_variant(cfg, lstm=False):
        # reference cfg/task/ShadowHandOpenAI_FF.yaml: openai obs + asym
        # states (utils/task_util.py:57-59 maps both variants to the same
        # class; the LSTM difference lives in the train config)
        cfg = dict(cfg or {})
        env = dict(cfg.get("env", {}))
        env.setdefault("observationType", "openai")
        env.setdefault("asymmetric_observations", True)
        cfg["env"] = env
        return ShadowHandTask(cfg)

    task_map["ShadowHandOpenAI_FF"] = _openai_variant
    task_map["ShadowHandOpenAI_LSTM"] = lambda cfg: _openai_variant(cfg, True)

    # bring-your-own-robot: task=Custom task.env.robot=<path>.urdf|.xml
    from omniisaacgymenvs_tpu.tasks.custom import CustomRobotTask

    task_map["Custom"] = CustomRobotTask
    return task_map


def get_task(name: str, cfg: dict | None = None) -> RLTask:
    task_map = _registry()
    if name not in task_map:
        raise KeyError(
            f"unknown task {name!r}; available: {sorted(task_map)}"
        )
    task = task_map[name](cfg)
    # DR config lives at the task yaml root (reference
    # cfg/task/ShadowHand.yaml domain_randomization block)
    from omniisaacgymenvs_tpu.utils.domain_randomization import Randomizer

    task.randomizer = Randomizer((cfg or {}).get("domain_randomization"))
    return task
