#!/usr/bin/env python
"""Custom dataset example — the reference's Custom_Dataset.ipynb flow:
bring your own arrays, split them with split_ssl_data, hand the trainer an
SSLDataBundle directly (docs/tutorial.md §3)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import semireward_tpu as st
from semireward_tpu.data.datasets import ArrayDataset, SSLDataBundle


def main():
    rs = np.random.RandomState(0)
    # your data: uint8 images [N,H,W,3] + integer labels [N]
    base = rs.randint(0, 256, (4, 32, 32, 3))
    y_all = rs.randint(0, 4, 512)
    x_all = np.clip(base[y_all] + rs.randint(-40, 40, (512, 32, 32, 3)),
                    0, 255).astype(np.uint8)
    x_test, y_test = x_all[:64], y_all[:64]
    x_train, y_train = x_all[64:], y_all[64:]

    lb_x, lb_y, ulb_x, ulb_y = st.split_ssl_data(
        x_train, y_train, num_classes=4, lb_num_labels=16)

    bundle = SSLDataBundle(
        train_lb=ArrayDataset(lb_x, lb_y),
        train_ulb=ArrayDataset(ulb_x, ulb_y),
        eval=ArrayDataset(x_test, y_test),
        num_classes=4, mean=(0.5,) * 3, std=(0.25,) * 3)

    cfg = st.get_config(dict(
        algorithm="fixmatch", net="wrn_28_2", dataset="custom",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=8, num_eval_iter=8, num_log_iter=2,
        eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
        save_dir="./saved_models/examples", save_name="custom_dataset"))

    trainer = st.Trainer(cfg, bundle=bundle)
    trainer.fit()
    print({k: round(float(v), 4) for k, v in trainer.evaluate().items()})


if __name__ == "__main__":
    main()
