"""LLM orchestration with JSON prompt cache.

Parity target: lang/llm.py:10-126 — same four prompts VERBATIM (movable-object
selection, distractor filtering with the idx-1 swap trick, multi-view caption
aggregation, instruction -> goal/normalising caption), same prompt->completion
JSON cache semantics (writes even when read_cache=False, llm.py:13), same
3-retry loop.

Backend: pluggable callable ``backend(prompt, temperature) -> completion``.
Default tries the openai package (gpt-4, as the reference); in network-less
environments the cache is the only path and a cache miss raises with a clear
message instead of hanging.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Callable, Optional


def openai_backend(model: str = "gpt-4"):
    import openai

    def call(prompt: str, temperature: float) -> str:
        tries = 3
        while True:
            try:
                response = openai.ChatCompletion.create(
                    model=model,
                    messages=[{"content": prompt, "role": "user"}],
                    temperature=temperature,
                    max_tokens=200,
                )
                return response["choices"][0]["message"]["content"]
            except Exception:
                tries -= 1
                if tries == 0:
                    raise
                time.sleep(0.5)

    return call


class LangModel:
    """Note: writes to the cache even if read_cache is False; that flag only
    gates reading (llm.py:11-13)."""

    def __init__(
        self,
        read_cache: bool = True,
        cache_path: str = "",
        backend: Optional[Callable[[str, float], str]] = None,
    ):
        self.check_cache = read_cache
        self.cache_path = cache_path
        self.cache: dict[str, str] = {}
        if cache_path and os.path.exists(cache_path):
            self.cache = json.load(open(cache_path))
        self.backend = backend

    def submit_prompt(self, prompt: str, temperature: float = 0.0, silent: bool = False) -> str:
        if self.cache_path and self.check_cache and prompt in self.cache:
            if not silent:
                print(f'Using response found in cache for prompt: "{prompt}"')
            return self.cache[prompt]

        max_len = 5000
        if len(prompt) > max_len:
            raise Exception(
                f"Prompt too long (length: {len(prompt)}). Max length is {max_len}."
            )
        backend = self.backend
        if backend is None:
            try:
                backend = openai_backend()
            except Exception as e:
                raise RuntimeError(
                    "LLM cache miss and no backend available. Provide a cache "
                    "file (use_cache_llm) or inject a backend callable. "
                    f"Prompt: {prompt[:120]!r}..."
                ) from e
        completion = backend(prompt, temperature)
        if self.cache_path:
            self.cache[prompt] = completion
            json.dump(self.cache, open(self.cache_path, "w"), indent=4)
        if not silent:
            print(f'Returning response: "{completion}"')
        return completion

    # ------------------------------------------------------------------
    # The four task prompts, verbatim from lang/llm.py:58-126.

    def get_principal_noun(self, caption: str) -> str:
        prompt = f'Suppose that you have an image caption describing a scene. What is the name of the most important object in this scene? Please answer only with one word, the name of the object. Caption: "{caption}"'
        response = self.submit_prompt(prompt)
        return response.lower().replace(".", "")

    def get_movable_obj_idx(self, user_instr: str, obj_captions: list[str]) -> int:
        prompt = 'Suppose that you are a robot. There are some objects in the scene. The user gives you an instruction. Decide which one object the user wants the robot to move. Do not include any objects which should remain unmoved (e.g. containers). Below, a description is given for each of the objects. You must answer with only one number, the index of the object which should be moved.\n'
        prompt += f'User instruction: "{user_instr}"\n'
        assert obj_captions[0] == "__background__"
        for i, caption in enumerate(obj_captions[1:]):  # Skip background
            prompt += f'Object {i + 1}: "{caption}"\n'
        response = self.submit_prompt(prompt)
        return int(re.findall(r"\d+", response)[0])

    def get_relevant_obj_idxs(
        self, scene_caption: str, obj_captions: list[str], movable_obj_idx: int
    ):
        prompt = 'Suppose that you are a robot. You are given a caption of a scene. Below, you are also given some object descriptions. For each object description, determine whether it is a distractor object. Return a separate line for each object containing Yes or No, where Yes means that it is a distractor. A distractor object is one which cannot possibly be one of the objects mentioned in the scene caption. Be careful that the object descriptions are based on low-quality images where the text is not easily identified, so ignore that part of the object descriptions. If the object description could plausibly describe an object in the scene, you must return No. Each line in the response should have the format: Object <number>: Yes/No. But if none of the objects in the scene are distractors, the final line should just be one word: "None".\n'
        prompt += f'Scene caption: "{scene_caption}"\n'
        assert obj_captions[0] == "__background__"

        # Temporarily swap object at idx 1 with movable object, so that the
        # LLM sees movable first (llm.py:81-85).
        obj_captions = obj_captions.copy()
        temp = obj_captions[1]
        obj_captions[1] = obj_captions[movable_obj_idx]
        obj_captions[movable_obj_idx] = temp

        for i, caption in enumerate(obj_captions[1:]):
            prompt += f'Object {i + 1}: "{caption}"\n'

        response = self.submit_prompt(prompt)
        decisions = response.split("\n")

        if decisions[-1] == "None":
            return list(range(1, len(obj_captions)))

        relevant_idxs = [movable_obj_idx]  # Movable always relevant
        for i, decision in enumerate(decisions):
            if i == 0:  # Skip movable
                continue
            if "Yes" not in decision:
                # Undo the temporary swap (llm.py:102-105).
                relevant_idx = 1 if i + 1 == movable_obj_idx else i + 1
                relevant_idxs.append(relevant_idx)
        assert len(decisions) + 1 == len(obj_captions), (
            "Error: LLM returned wrong number of decisions for distractor "
            "status for objects"
        )
        return relevant_idxs

    def aggregate_captions_for_obj(self, captions, silent: bool = True) -> str:
        prompt = 'Suppose we have captured many images of an object across different views. For each view, we have asked a network to caption the image. Some captions may be wrong, and there may be some other objects in view accidentally (e.g. inside or on top of the main object) which you must ignore. Please aggregate the caption information from across views, and write a caption which best describes the main object being captured. If the object can be a couple of things, mention them both.\n'
        prompt += "List of captions:\n"
        for caption in captions:
            prompt += f'"{caption}"\n'
        return self.submit_prompt(prompt, silent=silent)

    def parse_instr(self, user_instr: str) -> tuple[str, str]:
        prompt = 'Suppose you are a robot. You are given an instruction from a user. First, you need to extract the goal caption from the prompt. This is a description of the desired state after the user instruction has been executed. E.g. if the instruction is "shove the X under Y", the goal caption would be "an X under a Y". Also, you should extract a normalising caption from the goal caption. This will list the objects mentioned in the goal caption but without any spatial relations. Your first returned line should be the goal caption (the line should begin with "Goal caption: "), and the second line should be the normalising caption (the line should begin with "Normalising caption: "). No quotation marks needed. E.g. if the goal caption is "an X under a Y", then the normalising caption would be "an X and a Y". If the goal caption is "big Xs in the style of something", then the normalising caption is just "big Xs". However, you should keep spatial relations if they refer to a table, because objects will always be above table level. E.g. if the goal caption is "Xs arranged in a grid on a plastic table", then the normalising caption would be "Xs on a plastic table".\n'
        prompt += f'User instruction: "{user_instr}"\n'
        response = self.submit_prompt(prompt)
        goal_caption, norm_caption = response.split("\n")
        goal_caption = goal_caption.replace("Goal caption: ", "")
        norm_caption = norm_caption.replace("Normalising caption: ", "")
        return goal_caption, norm_caption
