"""Ground-truth/detection box rendering for summaries and demos.

Functional parity with the reference's PIL-based renderer
(/root/reference/lib/utils/visualization.py:17-89): per-class colors from a
fixed palette, labeled rectangles, batch-of-one image in, image out. The
reference wires this into TensorBoard via tf.py_func (network.py:47-55);
here it is a host-side helper for the metrics channel and demo output.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont

# 120-color palette, deterministic per class index
STANDARD_COLORS = [
    'AliceBlue', 'Chartreuse', 'Aqua', 'Aquamarine', 'Azure', 'Beige',
    'Bisque', 'BlanchedAlmond', 'BlueViolet', 'BurlyWood', 'CadetBlue',
    'AntiqueWhite', 'Chocolate', 'Coral', 'CornflowerBlue', 'Cornsilk',
    'Crimson', 'Cyan', 'DarkCyan', 'DarkGoldenRod', 'DarkGrey', 'DarkKhaki',
    'DarkOrange', 'DarkOrchid', 'DarkSalmon', 'DarkSeaGreen',
    'DarkTurquoise', 'DarkViolet', 'DeepPink', 'DeepSkyBlue', 'DodgerBlue',
    'FireBrick', 'FloralWhite', 'ForestGreen', 'Fuchsia', 'Gainsboro',
    'GhostWhite', 'Gold', 'GoldenRod', 'Salmon', 'Tan', 'HoneyDew',
    'HotPink', 'IndianRed', 'Ivory', 'Khaki', 'Lavender', 'LavenderBlush',
    'LawnGreen', 'LemonChiffon', 'LightBlue', 'LightCoral', 'LightCyan',
    'LightGoldenRodYellow', 'LightGray', 'LightGrey', 'LightGreen',
    'LightPink', 'LightSalmon', 'LightSeaGreen', 'LightSkyBlue',
    'LightSlateGray', 'LightSlateGrey', 'LightSteelBlue', 'LightYellow',
    'Lime', 'LimeGreen', 'Linen', 'Magenta', 'MediumAquaMarine',
    'MediumOrchid', 'MediumPurple', 'MediumSeaGreen', 'MediumSlateBlue',
    'MediumSpringGreen', 'MediumTurquoise', 'MediumVioletRed', 'MintCream',
    'MistyRose', 'Moccasin', 'NavajoWhite', 'OldLace', 'Olive', 'OliveDrab',
    'Orange', 'OrangeRed', 'Orchid', 'PaleGoldenRod', 'PaleGreen',
    'PaleTurquoise', 'PaleVioletRed', 'PapayaWhip', 'PeachPuff', 'Peru',
    'Pink', 'Plum', 'PowderBlue', 'Purple', 'Red', 'RosyBrown', 'RoyalBlue',
    'SaddleBrown', 'Green', 'SandyBrown', 'SeaGreen', 'SeaShell', 'Sienna',
    'Silver', 'SkyBlue', 'SlateBlue', 'SlateGray', 'SlateGrey', 'Snow',
    'SpringGreen', 'SteelBlue', 'GreenYellow', 'Teal', 'Thistle', 'Tomato',
    'Turquoise', 'Violet', 'Wheat', 'White', 'WhiteSmoke', 'Yellow',
    'YellowGreen',
]

NUM_COLORS = len(STANDARD_COLORS)


def _draw_single_box(image, xmin, ymin, xmax, ymax, display_str,
                     color='black', thickness=4):
    draw = ImageDraw.Draw(image)
    try:
        font = ImageFont.load_default()
    except Exception:
        font = None
    draw.line([(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin),
               (xmin, ymin)], width=thickness, fill=color)
    if font is not None:
        left, top, right, bottom = draw.textbbox((0, 0), display_str,
                                                 font=font)
        text_w, text_h = right - left, bottom - top
        margin = np.ceil(0.05 * text_h)
        draw.rectangle([(xmin, ymin), (xmin + text_w + 2 * margin,
                                       ymin + text_h + 2 * margin)],
                       fill=color)
        draw.text((xmin + margin, ymin + margin), display_str,
                  fill='black', font=font)
    return image


def draw_bounding_boxes(image, gt_boxes, im_info=None):
    """image: [1, H, W, 3] or [H, W, 3] float (RGB, 0-255); gt_boxes:
    [N, 5] (x1, y1, x2, y2, cls) in scaled coords; im_info: (h, w, scale).
    Returns the annotated image with the same leading shape."""
    batched = image.ndim == 4
    img = image[0] if batched else image
    scale = float(im_info[2]) if im_info is not None else 1.0
    disp_image = Image.fromarray(np.uint8(np.clip(img, 0, 255)))
    for i in range(gt_boxes.shape[0]):
        this_class = int(gt_boxes[i, 4])
        disp_image = _draw_single_box(
            disp_image,
            gt_boxes[i, 0] / scale, gt_boxes[i, 1] / scale,
            gt_boxes[i, 2] / scale, gt_boxes[i, 3] / scale,
            'N%02d-C%02d' % (i, this_class),
            color=STANDARD_COLORS[this_class % NUM_COLORS])
    out = np.asarray(disp_image).astype(np.float32)
    return out[None] if batched else out
