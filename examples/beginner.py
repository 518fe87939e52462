#!/usr/bin/env python
"""Beginner example — the reference's Beginner_Example.ipynb flow in the
TPU-native API: config -> dataset -> trainer -> fit -> evaluate -> predict.

Runs on anything (synthetic data, a few steps). For a real run, switch
dataset/num_labels/num_train_iter to a corpus config's values or load one:
    cfg = semireward_tpu.from_yaml("config/usb_cv/fixmatch/fixmatch_cifar100_200_0.yaml")
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import semireward_tpu as st


def main():
    cfg = st.get_config(dict(
        algorithm="fixmatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=8, num_eval_iter=8, num_log_iter=2,
        eval_batch_size=16, img_size=32, optim="SGD", lr=0.03,
        ema_m=0.0, save_dir="./saved_models/examples", save_name="beginner"))

    trainer = st.Trainer(cfg)
    trainer.fit()                      # train + periodic eval + checkpoints
    metrics = trainer.evaluate()       # sklearn-parity metrics dict
    print({k: round(float(v), 4) for k, v in metrics.items()})

    x = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
    logits = trainer.predict(x)
    print("predict:", np.asarray(logits).shape)


if __name__ == "__main__":
    main()
