"""Audio-tag post-processing: logits -> human-readable label lists.

Parity with the reference (whisper_at/at_post_processing.py:14-62): top-k
selection per time segment with a logit threshold and class filter, label
names in any of the 84 translated languages from the shipped asset.
"""

import json
import os
import warnings
from functools import lru_cache

import numpy as np

from .tokenizer import LANGUAGES

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@lru_cache(maxsize=1)
def _label_name_dict() -> dict:
    with open(os.path.join(_ASSETS, "label_name_dict.json")) as json_file:
        return json.load(json_file)


def parse_at_label(
    result: dict,
    language: str = "follow_asr",
    top_k: int = 5,
    p_threshold: float = -1,
    include_class_list=None,
):
    """Parse the transcribe() result dict into per-segment audio tag lists.

    Returns [{'time': {'start': s, 'end': e}, 'audio tags': [(name, logit)]}].
    """
    if include_class_list is None:
        include_class_list = list(range(527))
    include = set(include_class_list)

    asr_language = result["language"]
    at_time_res = result["at_time_res"]
    audio_tag = np.asarray(result["audio_tag"], dtype=np.float32)

    if language == "follow_asr":
        language = asr_language

    label_name_dict = _label_name_dict()
    if language not in label_name_dict:
        warnings.warn(
            f"{language} language not supported. Use English label names instead. "
            "If you wish to use label names of a specific language, please "
            "specify the language argument"
        )
        language = "en"
    label_name_list = label_name_dict[language]

    all_res = []
    for i in range(audio_tag.shape[0]):
        top_indices = np.argsort(audio_tag[i])[::-1][:top_k]
        cur_time_stamp = {"start": i * at_time_res, "end": (i + 1) * at_time_res}
        cur_labels_list = []
        for j in top_indices:
            value = float(audio_tag[i, j])
            if value > p_threshold and int(j) in include:
                cur_labels_list.append((label_name_list[int(j)], value))
        all_res.append({"time": cur_time_stamp, "audio tags": cur_labels_list})
    return all_res


def print_label_name(language: str = "en"):
    label_name_list = _label_name_dict()[language]
    for i, name in enumerate(label_name_list):
        print("index: {:d} : {:s}".format(i, name))


def print_support_language():
    for key in _label_name_dict().keys():
        print("language code: {:s} : {:s}".format(key, LANGUAGES[key]))
