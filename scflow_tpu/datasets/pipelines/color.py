"""Photometric augmentations (reference datasets/pipelines/color_transform.py).
All operate on the per-object patch lists produced by Crop; images are uint8
BGR until Normalize converts to float RGB."""

import glob
import random
import warnings
from os import path as osp
import cv2
import numpy as np

from scflow_tpu.datasets.mask import BitmapMasks
from scflow_tpu.registry import PIPELINES


class ColorTransform:
    def __init__(self, patch_level=True, image_keys=("img",)):
        self.patch_level = patch_level
        self.image_keys = image_keys
        self.augment_with_mask = False

    def augment(self, img, mask=None):
        raise NotImplementedError

    def __call__(self, results):
        for key in self.image_keys:
            imgs = results[key]
            if self.patch_level:
                masks = results.get("gt_masks") if self.augment_with_mask else None
                out = []
                for i, patch in enumerate(imgs):
                    if self.augment_with_mask:
                        out.append(self.augment(patch, masks[i]))
                    else:
                        out.append(self.augment(patch))
                results[key] = out
            else:
                results[key] = self.augment(imgs)
        return results


@PIPELINES.register_module("RandomHSV")
class RandomHSV(ColorTransform):
    def __init__(self, h_ratio, s_ratio, v_ratio, p=1.0, patch_level=True,
                 image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.h_ratio, self.s_ratio, self.v_ratio, self.p = h_ratio, s_ratio, v_ratio, p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        a = random.uniform(-1, 1) * self.h_ratio + 1
        b = random.uniform(-1, 1) * self.s_ratio + 1
        c = random.uniform(-1, 1) * self.v_ratio + 1
        h = hsv[:, :, 0].astype(np.float32) * a
        s = hsv[:, :, 1].astype(np.float32) * b
        v = hsv[:, :, 2].astype(np.float32) * c
        hsv[:, :, 0] = h if a < 1 else h.clip(None, 179)
        hsv[:, :, 1] = s if b < 1 else s.clip(None, 255)
        hsv[:, :, 2] = v if c < 1 else v.clip(None, 255)
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


@PIPELINES.register_module("RandomNoise")
class RandomNoise(ColorTransform):
    def __init__(self, noise_ratio, p=1.0, patch_level=True, image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.noise_ratio, self.p = noise_ratio, p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        sigma = random.uniform(0, self.noise_ratio)
        noisy = img + np.random.normal(0, sigma, img.shape) * 255
        return np.uint8(np.clip(noisy, 0, 255))


@PIPELINES.register_module("RandomSmooth")
class RandomSmooth(ColorTransform):
    def __init__(self, max_kernel_size=7, p=1.0, patch_level=True, image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.kernel_sizes = [i * 2 + 1 for i in range(int(max_kernel_size) // 2 + 1)]
        self.p = p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        ks = random.choice(self.kernel_sizes)
        return cv2.blur(img, (ks, ks))


@PIPELINES.register_module("RandomSharpness")
class RandomSharpness(ColorTransform):
    def __init__(self, kernel_sizes=(5, 7, 9, 11), p=1.0, patch_level=True,
                 image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.kernel_sizes = list(kernel_sizes)
        self.p = p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        ks = random.choice(self.kernel_sizes)
        smooth = cv2.blur(img, (ks, ks))
        if random.random() < 0.5:
            edge = img / (smooth.astype(np.float32) + 0.01)
        else:
            edge = img - smooth.astype(np.float32)
        edge = cv2.normalize(edge, None, alpha=0, beta=255,
                             norm_type=cv2.NORM_MINMAX).astype(np.uint8)
        alpha = random.uniform(0.5, 0.95)
        out = img * (1 - alpha) + edge * alpha
        return cv2.normalize(out, None, alpha=0, beta=255,
                             norm_type=cv2.NORM_MINMAX).astype(np.uint8)


@PIPELINES.register_module("RandomGray")
class RandomGray(ColorTransform):
    def __init__(self, p=1.0, patch_level=True, image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.p = p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)


@PIPELINES.register_module("RandomBackground")
class RandomBackground(ColorTransform):
    """Swap the patch background with a random image (mask-based compositing,
    p=0.3 in the pbr configs)."""

    def __init__(self, background_dir, p=0.8, file_client_args=None,
                 flag="color", patch_level=True):
        super().__init__(patch_level)
        self.augment_with_mask = True
        self.backgrounds = sorted(
            glob.glob(osp.join(background_dir, "*.jpg"))
            + glob.glob(osp.join(background_dir, "*.png"))
        )
        if not self.backgrounds:
            raise RuntimeError(f"no background images in {background_dir}")
        self.p = p

    def augment(self, img, mask=None):
        if random.random() > self.p:
            return img
        path = random.choice(self.backgrounds)
        bg = cv2.imread(path, cv2.IMREAD_COLOR)
        if bg is None:
            warnings.warn(f"failed to load background {path}")
            return img
        if bg.shape[:2] != img.shape[:2]:
            bg = cv2.resize(bg, (img.shape[1], img.shape[0]))
        alpha = np.ones(img.shape[:2], np.float32)
        alpha[mask.get_background_mask()] = 0
        alpha = alpha[..., None]
        return np.uint8(bg * (1 - alpha) + img[..., :3] * alpha)


@PIPELINES.register_module("RandomOcclusion")
class RandomOcclusion:
    """Synthetic rectangular occluders with mask update
    (color_transform.py:270-330)."""

    def __init__(self, p=0.0, bbox_field="gt_bboxes", mask_field="gt_masks",
                 size_range=(0.02, 0.7), ratio_range=(0.5, 2.0), min_bbox_size=20):
        self.p = p
        self.bbox_field = bbox_field
        self.mask_field = mask_field
        self.size_range = size_range
        self.ratio_range = ratio_range
        self.min_bbox_size = min_bbox_size

    def __call__(self, results):
        images = results["img"]
        bboxes = results[self.bbox_field]
        masks = results[self.mask_field]
        x1, y1, x2, y2 = bboxes[..., 0], bboxes[..., 1], bboxes[..., 2], bboxes[..., 3]
        bbox_size = (x2 - x1) * (y2 - y1)
        new_images, new_masks = [], []
        for i in range(len(bboxes)):
            img, mask = images[i], masks[i]
            if random.random() > self.p or bbox_size[i] < self.min_bbox_size:
                new_images.append(img)
                new_masks.append(mask)
                continue
            h, w = img.shape[:2]
            size = random.uniform(*self.size_range) * bbox_size[i]
            ratio = random.uniform(*self.ratio_range)
            ew, eh = int(np.sqrt(size * ratio)), int(np.sqrt(size / ratio))
            ecx, ecy = random.uniform(x1[i], x2[i]), random.uniform(y1[i], y2[i])
            esx = int(np.clip(ecx - ew / 2 + 0.5, 0, w - 1))
            esy = int(np.clip(ecy - eh / 2 + 0.5, 0, h - 1))
            eex = int(np.clip(ecx + ew / 2 + 0.5, 0, w - 1))
            eey = int(np.clip(ecy + eh / 2 + 0.5, 0, h - 1))
            img = img.copy()
            img[esy:eey, esx:eex] = np.random.randint(
                256, size=(eey - esy, eex - esx, 3)
            )
            occ = np.zeros((h, w), np.uint8)
            occ[esy:eey, esx:eex] = 1
            new_masks.append(mask.merge_background_mask(occ))
            new_images.append(img)
        results["img"] = new_images
        results[self.mask_field] = new_masks
        return results


@PIPELINES.register_module("Normalize")
class Normalize(ColorTransform):
    def __init__(self, mean, std, to_rgb=True, patch_level=True, image_keys=("img",)):
        super().__init__(patch_level, image_keys)
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb

    def augment(self, img, mask=None):
        img = img.astype(np.float32)
        if self.to_rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return (img - self.mean) / self.std

    def __call__(self, results):
        if len(results["labels"]) > 0:
            results = super().__call__(results)
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std, to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module("RandomOcclusionV2")
class RandomOcclusionV2:
    """Paste a random occluder image (black background) over the object with
    a random scale/rotation/translation; masks are updated
    (color_transform.py:333-402)."""

    def __init__(self, augment_mask_field, data_root, image_list,
                 file_client_args=None, p=1.0, scale_range=(0.5, 1.0),
                 rotate_range=(-45, 45)):
        self.data_root = data_root
        with open(image_list) as f:
            self.image_list = [
                osp.join(data_root, line.strip()) for line in f if line.strip()
            ]
        self.augment_mask_field = augment_mask_field
        self.p = p
        self.scale_range = scale_range
        self.rotate_range = rotate_range

    def __call__(self, results):
        if random.random() > self.p:
            return results
        img = results["img"]
        mask = results[self.augment_mask_field]
        h, w = img.shape[:2]
        occ_bgr = cv2.imread(random.choice(self.image_list), cv2.IMREAD_COLOR)
        if occ_bgr is None:
            return results
        if occ_bgr.shape[:2] != (h, w):
            occ_bgr = cv2.resize(occ_bgr, (w, h))
        occ_fg = (
            (occ_bgr[..., 0] > 0) | (occ_bgr[..., 1] > 0) | (occ_bgr[..., 2] > 0)
        ).astype(np.uint8)
        occ_masks = BitmapMasks([occ_fg], h, w)
        ob = occ_masks.get_bboxes()[0]
        origin = mask.get_bboxes()[0]
        if ob[2] <= ob[0] or origin[2] <= origin[0]:
            return results
        ocx, ocy = (ob[0] + ob[2]) / 2, (ob[1] + ob[3]) / 2
        pleft = random.randint(int(ocx - origin[2]), int(ocx - origin[0]))
        ptop = random.randint(int(ocy - origin[3]), int(ocy - origin[1]))
        shift = np.array([[1, 0, -pleft], [0, 1, -ptop], [0, 0, 1]], np.float32)
        scale = np.sqrt(max(mask.areas[0], 1) / max(occ_masks.areas[0], 1))
        sf = random.uniform(scale * self.scale_range[0], scale * self.scale_range[1])
        angle = random.uniform(*self.rotate_range)
        rs = cv2.getRotationMatrix2D((ocx, ocy), angle=angle, scale=sf)
        tm = shift @ np.concatenate([rs, [[0, 0, 1]]], axis=0)
        occ_bgr = cv2.warpAffine(occ_bgr, tm[:2], (w, h), flags=cv2.INTER_LINEAR,
                                 borderValue=(0, 0, 0))
        occ_fg_w = occ_masks.warpaffine(tm[:2], w, h)
        alpha = occ_fg_w.masks[0].astype(np.float32)[..., None]
        results["img"] = ((1 - alpha) * img + alpha * occ_bgr).astype(np.uint8)
        for field in results.get("mask_fields", ["gt_masks"]):
            results[field] = results[field].merge_background_mask(occ_fg_w.masks[0])
        return results
