from .ate import evaluate_ate, evaluate_rpe, TrajectoryError  # noqa: F401
