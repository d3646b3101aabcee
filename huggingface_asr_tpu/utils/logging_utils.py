"""Metrics logging: JSONL always, TensorBoard and W&B when available.

The reference reports to W&B through HF Trainer (reference: recipe env wiring
recipes/librispeech/train_ctc.sh:24-27, prediction tables eval_utils.py:13-26).
W&B may be absent in this environment, so the logger degrades gracefully:
every metric goes to ``<dir>/metrics.jsonl``; tensorboardX and wandb are
used opportunistically.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, use_wandb: bool = True, run_name: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._tb = None
        self._wandb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
        except Exception:
            pass
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(project=os.environ.get("WANDB_PROJECT", "tpu-asr"),
                               name=run_name, dir=output_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]):
        record = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_predictions(self, step: int, split: str, refs: List[str], hyps: List[str],
                        max_rows: int = 50):
        """Prediction table (reference write_wandb_pred, eval_utils.py:13-26)."""
        rows = list(zip(refs, hyps))[:max_rows]
        path = os.path.join(os.path.dirname(self.path), f"predictions_{split}_{step}.tsv")
        with open(path, "w") as f:
            f.write("label\tprediction\n")
            for r, h in rows:
                f.write(f"{r}\t{h}\n")
        if self._wandb is not None:
            table = self._wandb.Table(columns=["label", "prediction"], data=rows)
            self._wandb.log({f"eval_{split}_predictions": table}, step=step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
