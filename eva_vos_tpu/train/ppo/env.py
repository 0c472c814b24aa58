"""Single-frame annotation MDP for PPO training.

Behavior parity target: ``ppo/annotation_env.py`` — state is the SAM image
embedding plus the current SAM mask at 224p; actions are click / mask /
stop; rewards are IoU gains per second of annotation cost, with the
click-overhead charge and the terminal total-efficiency reward.

Design fix over the reference: the SAM controller is INJECTED and reused
across episodes (the reference constructs a fresh ViT-H per episode,
``annotation_env.py:24`` — noted in SURVEY.md §3.4 as an inefficiency not
to copy).  ``reset`` re-embeds only the new frame.
"""

from __future__ import annotations

import numpy as np

from ...annotator.annotator import Annotator
from ...annotator.robots import ClickRobot
from ...ops.metrics import compute_iou
from ...interactions.policies import masks_to_224_3ch
from ...utils.costs import ANNOTATION_COSTS

AVAIL_ACTIONS = ("click", "mask", "stop")


class AnnotationEnv:
    def __init__(self, sam_controller, image, gt_mask, init_mask, max_steps,
                 use_cost: bool = False):
        """image [H, W, 3] normalized; gt_mask/init_mask [H, W] (or [1, H, W])."""
        self.annotator = Annotator(sam_controller)
        self.click_robot = ClickRobot()
        self.image = np.asarray(image)
        self.gt_mask = np.asarray(gt_mask).squeeze().astype(bool)
        self.init_mask = np.asarray(init_mask).squeeze()
        self.use_cost = use_cost
        self.max_steps = max_steps
        self.avail_actions = AVAIL_ACTIONS
        self.reset()

    # ------------------------------------------------------------------
    def reset(self):
        self.annotator.set_image_to_sam(self.image)
        self.img_embedding = np.asarray(
            self.annotator.sam.get_image_embedding())  # [C, 64, 64]

        logits, sam_mask, clicks, labels = \
            self.annotator.create_similar_samlogits(
                self.init_mask.astype(bool))
        if sam_mask is None:
            sam_mask = np.zeros_like(self.gt_mask)

        self.sam_logits = logits
        self.sam_mask = np.asarray(sam_mask).squeeze().astype(bool)
        self.prompt_clicks = clicks
        self.prompt_labels = labels
        self.iou = compute_iou(self.sam_mask[None], self.gt_mask[None])
        self.init_iou = self.iou
        self.annotation_cost = 0.0
        self.curr_cost = 0.0
        self.annotation_actions = []
        self.done = False
        self._update_state()
        return self.state

    def _update_state(self):
        mask224 = np.asarray(masks_to_224_3ch(
            self.sam_mask[None].astype(np.float32)))  # [1, 224, 224, 3]
        emb = np.transpose(self.img_embedding, (1, 2, 0))[None]  # [1,64,64,C]
        self.state = [emb, mask224]
        if self.use_cost:
            self.state.append(
                np.asarray([[self.annotation_cost]], np.float32))

    # ------------------------------------------------------------------
    def _click(self):
        if self.sam_logits is None:
            self.prompt_clicks, self.prompt_labels = \
                self.click_robot.middle_click(self.gt_mask)
        else:
            clicks, labels = self.click_robot.interact(self.sam_mask,
                                                       self.gt_mask)
            self.prompt_clicks = np.concatenate(
                [self.prompt_clicks, clicks], 0)
            self.prompt_labels = np.concatenate(
                [self.prompt_labels, labels], 0)

        masks, _, logits = self.annotator.sam.predict(
            click_coords=self.prompt_clicks, click_labels=self.prompt_labels,
            mask_input=self.sam_logits, multimask_output=True)
        iou, idx = self.annotator.best_sam_mask(masks, self.gt_mask)
        self.sam_mask = np.asarray(masks[idx]).squeeze().astype(bool)
        self.sam_logits = logits[idx][None]
        self.iou = iou

    def _reward(self, prev_iou, action):
        if self.done:
            if "click" in self.annotation_actions:
                self.annotation_cost += ANNOTATION_COSTS["click_overhead"]
            if self.annotation_cost == 0:
                # 'stop' as the first action: zero cost, zero gain.  The
                # reference divides by zero here (annotation_env.py:193) —
                # unreachable with its 2-action space; defined as 0 reward.
                return 0.0
            return (self.iou - self.init_iou) / self.annotation_cost
        return (self.iou - prev_iou) / self.curr_cost

    def step(self, action_idx: int):
        action = self.avail_actions[action_idx]
        assert not self.done
        self.annotation_actions.append(action)
        self.curr_cost = ANNOTATION_COSTS[action]
        self.annotation_cost += self.curr_cost

        prev_iou = self.iou
        if action == "click":
            self._click()
            done = len(self.annotation_actions) == self.max_steps
        elif action == "mask":
            self.sam_mask = self.gt_mask.copy()
            self.iou = 1.0
            done = True
        else:  # stop
            done = True

        self.done = done
        reward = self._reward(prev_iou, action)
        self._update_state()
        return reward, self.state, done
