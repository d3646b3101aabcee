"""Global CMVN statistics entry point (reference:
src/trainers/compute_dataset_statistics.py).

Computes per-mel-bin mean/std over the train split with the on-device front
end and saves ``global_means.npy``/``global_stds.npy`` (+ JSON) for
``LogMelFrontEnd(norm_type="global")``.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os

import numpy as np

from huggingface_asr_tpu.cli.common import eval_batches, setup_logging
from huggingface_asr_tpu.data.bucketing import BucketingConfig
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd, compute_global_stats
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class StatsArguments:
    output_dir: str = "stats"
    batch_size: int = 64
    max_batches: int = 0  # 0 = all


def main(argv=None):
    parser = DataclassArgumentParser([StatsArguments, DataConfig])
    args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(args.output_dir)

    dataset = get_dataset(data_cfg)
    train = dataset[data_cfg.train_split]
    collator = SpeechCollator(
        CollatorConfig(bucketing=BucketingConfig(batch_size=args.batch_size,
                                                 pad_to_multiple=16000))
    )
    frontend = LogMelFrontEnd(LogMelConfig(norm_type="none"))

    def batches():
        for i, batch in enumerate(eval_batches(train, collator, args.batch_size)):
            # Drop the repeated rows eval_batches pads the last batch with —
            # they would bias the global CMVN stats.
            n = int(batch.pop("_num_real", 0)) or None
            if args.max_batches and i >= args.max_batches:
                break
            yield batch["input_values"][:n], batch["input_values_lengths"][:n]

    mean, std = compute_global_stats(frontend, batches())
    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "global_means.npy"), mean)
    np.save(os.path.join(args.output_dir, "global_stds.npy"), std)
    with open(os.path.join(args.output_dir, "global_stats.json"), "w") as f:
        json.dump({"means": mean.tolist(), "stds": std.tolist()}, f)
    logger.info("saved global CMVN stats to %s", args.output_dir)
    return mean, std


if __name__ == "__main__":
    main()
