"""Experiment logging backends.

TensorBoard is first-class (tf.summary, wired in cli/train.py).  Weights &
Biases is optional and *gated* — the reference README explicitly warns its
multitask loop is not fully W&B-compatible (reference README.md:26-27,
utils/wandb_logging/); here it degrades to a no-op when wandb is absent or
disabled, never crashing the loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class WandbLogger:
    """reference utils/wandb_logging/wandb_utils.py surface, no-op safe."""

    def __init__(self, opt=None, name: Optional[str] = None,
                 run_id: Optional[str] = None, job_type: str = "Training"):
        self.wandb = None
        self.run = None
        try:
            import wandb  # noqa: F401
            self.wandb = wandb
        except ImportError:
            return
        if opt is not None and getattr(opt, "no_wandb", False):
            self.wandb = None
            return
        try:
            self.run = self.wandb.init(
                config=vars(opt) if opt else None, resume="allow",
                project="multiyolov5_tpu", name=name, id=run_id,
                job_type=job_type)
        except Exception:
            self.wandb = None

    @property
    def enabled(self) -> bool:
        return self.run is not None

    def log(self, d: Dict[str, Any], step: Optional[int] = None) -> None:
        if self.run is not None:
            self.run.log(d, step=step)

    def log_model(self, path: str, opt=None, epoch: int = 0,
                  fitness: float = 0.0, best: bool = False) -> None:
        if self.run is None:
            return
        art = self.wandb.Artifact(f"run_{self.run.id}_model", type="model",
                                  metadata={"epoch": epoch, "fitness": fitness})
        art.add_file(path)
        self.run.log_artifact(art, aliases=["latest", "best"] if best else ["latest"])

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
