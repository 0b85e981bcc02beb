"""Offline MRI preprocessing: NIfTI -> slices -> captions -> labels -> splits.

Capability parity with reference `preprocessing.py` (702 LoC, 4 linear steps;
SURVEY.md §2.7). Run as a pipeline via `python -m mrclip_tpu.preprocessing`.
"""

from .binning import (
    DROP_FLIP_ANGLES,
    MODEL_NAME_MAPPING,
    get_bin_label,
    label_rows,
    load_bin_intervals,
    make_label_string,
    parse_dicom_metadata,
)
from .captions import (
    build_caption_rows,
    extract_slice_number,
    generate_text_from_json,
    simplify_text,
    slice_range_for_plane,
)
from .nifti import determine_plane, process_nifti, read_nifti, volume_to_slices
from .split import extract_image_id, filter_slices, merge_and_shuffle_split
