"""DataHub: owns all loaders + transform pipelines for a task.

Mirrors src/dataloader/datahub.py: split files per round, optional
meanstd.txt, train (shuffled) / trainseq (sequential, used for calibration
and train-set eval) / val / test loaders, sn->filename mapping, slide
patch/overlap config, and post-hoc label-merge metadata attached by the
definer (src/definer.py:113-126).
"""
from __future__ import annotations

import os.path as P
from typing import Callable, Optional

import numpy as np

from . import transforms as T
from .datasets import Loader, SegDataset, SegDatasetOnDisk, read_split


def file_to_dict(fname, sep=","):
    if fname is None or not P.isfile(fname):
        return None
    d = {}
    with open(fname) as f:
        for line in f.read().splitlines():
            k, v = line.split(sep)
            d[k] = v
    return d


class DataHub:
    def __init__(self, data_dir, modalities, train_split=None, val_split=None,
                 test_split=None, true_test_split=None, train_batchsize=1,
                 test_batchsize=1, mean=None, std=None, access_type="npz",
                 rand_flip=(1, 1, 1), crop_type=None, crop_size_img=None,
                 balance_rate=0.5, balance_mask_func=None, mod_drop_rate=0,
                 on_disk=False, random_noise_prob=None, scale_bound=None,
                 scale_order=1, scale_p=0.5, random_black_patch_size=None,
                 sn_fn_file=None, slide_patch_size=None, slide_overlap=None,
                 tfm_lambda: Optional[Callable] = None, num_workers=0, seed=0):
        self.data_dir = data_dir
        self.slide_patch_size = slide_patch_size
        self.slide_overlap = slide_overlap
        self.sn_to_fn_map = file_to_dict(
            P.join(data_dir, sn_fn_file) if sn_fn_file else None)
        self.train_sn = self.val_sn = self.test_sn = self.true_test_sn = None
        self.trainloader = self.trainseqloader = None
        self.valloader = self.testloader = self.true_test_image_loader = None
        # attached later by the definer (definer.py:122-125)
        self.restore_shape_func = None
        self.restore_infokw = None
        self.merge_label_func = None
        self.multilabel_fusetype = None

        rng = np.random.default_rng(seed)

        if P.exists(P.join(data_dir, "meanstd.txt")):
            with open(P.join(data_dir, "meanstd.txt")) as f:
                lines = f.read().splitlines()
            mean = [float(x) for x in lines[0].split()[1:]]
            std = [float(x) for x in lines[1].split()[1:]]
            print("import mean and std value from file 'meanstd.txt'")

        basic = [T.ToArray(), T.Normalize(mean, std)]

        train_ops = list(basic)
        if random_black_patch_size is not None:
            train_ops.append(T.RandomBlack(random_black_patch_size, rng=rng))
        if mod_drop_rate > 0:
            train_ops.append(T.RandomModalityDropout(mod_drop_rate, rng=rng))
        if rand_flip is not None:
            train_ops.append(T.RandomFlip(rand_flip, rng=rng))
        if crop_type == "random":
            if scale_bound:
                train_ops.append(T.RandomScaleCrop(
                    scale_bound[0], scale_bound[1], crop_size_img, scale_order,
                    scale_p, rng=rng))
            else:
                train_ops.append(T.RandomCrop(crop_size_img, rng=rng))
        elif crop_type == "balance":
            train_ops.append(T.BalanceCrop(balance_rate, crop_size_img,
                                           None, balance_mask_func, rng=rng))
        elif crop_type == "center":
            train_ops.append(T.CenterCrop(crop_size_img))
        elif crop_type is not None:
            raise ValueError("Unknown train crop type.")
        if random_noise_prob:
            train_ops.append(T.RandomNoise(random_noise_prob, 0.3, rng=rng))

        test_ops = list(basic)
        if tfm_lambda:
            train_ops.append(T.Lambda(tfm_lambda))
            test_ops.append(T.Lambda(tfm_lambda))

        train_tf = T.Compose(train_ops)
        test_tf = T.Compose(test_ops)

        DS = SegDatasetOnDisk if on_disk else SegDataset

        def exists(split):
            return split and P.isfile(split)

        if exists(train_split):
            self.train_sn = read_split(train_split)
            ds = DS(data_dir, train_split, modalities, access_type,
                    transform_rand=train_tf, transform_fix=test_tf)
            self.trainloader = Loader(ds, train_batchsize, shuffle=True,
                                      seed=seed)
            if num_workers and num_workers > 0:
                from .prefetch import PrefetchLoader

                self.trainloader = PrefetchLoader(self.trainloader,
                                                  depth=min(num_workers, 4))
            self.trainseqloader = Loader(ds, test_batchsize, shuffle=False)
        if exists(val_split):
            self.val_sn = read_split(val_split)
            ds = DS(data_dir, val_split, modalities, access_type,
                    transform_rand=None, transform_fix=test_tf)
            self.valloader = Loader(ds, test_batchsize)
        if exists(test_split):
            self.test_sn = read_split(test_split)
            ds = DS(data_dir, test_split, modalities, access_type,
                    transform_rand=None, transform_fix=test_tf)
            self.testloader = Loader(ds, test_batchsize)
        if exists(true_test_split):
            self.true_test_sn = read_split(true_test_split)
            mods = list(modalities)
            mods[0] = None
            ds = DS(data_dir, true_test_split, mods, access_type,
                    transform_rand=None, transform_fix=test_tf)
            self.true_test_image_loader = Loader(ds, test_batchsize)
