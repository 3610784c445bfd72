"""SFU-HW-Objects (YOLO-format) annotations -> absolute-coordinate dumps.

Port of the reference sfu_hw_objects_annotations_to_dumps.py:92-155: per
video, normalized center-format boxes become `label x1 y1 x2 y2` rows in
object_detection/imNNNNN.txt plus a metadata.txt class map (COCO names).
The reference's y-coordinate clamp against width (reference :121-123) is
fixed to clamp against height.
"""

from __future__ import annotations

import argparse
import os
import shutil
from glob import glob

COCO_CLASS_DICT = {
    0: "person", 1: "bicycle", 2: "car", 3: "motorcycle", 4: "airplane",
    5: "bus", 6: "train", 7: "truck", 8: "boat", 9: "traffic light",
    10: "fire hydrant", 11: "stop sign", 12: "parking meter", 13: "bench",
    14: "bird", 15: "cat", 16: "dog", 17: "horse", 18: "sheep", 19: "cow",
    20: "elephant", 21: "bear", 22: "zebra", 23: "giraffe", 24: "backpack",
    25: "umbrella", 26: "handbag", 27: "tie", 28: "suitcase", 29: "frisbee",
    30: "skis", 31: "snowboard", 32: "sports ball", 33: "kite",
    34: "baseball bat", 35: "baseball glove", 36: "skateboard",
    37: "surfboard", 38: "tennis racket", 39: "bottle", 40: "wine glass",
    41: "cup", 42: "fork", 43: "knife", 44: "spoon", 45: "bowl",
    46: "banana", 47: "apple", 48: "sandwich", 49: "orange", 50: "broccoli",
    51: "carrot", 52: "hot dog", 53: "pizza", 54: "donut", 55: "cake",
    56: "chair", 57: "couch", 58: "potted plant", 59: "bed",
    60: "dining table", 61: "toilet", 62: "tv", 63: "laptop", 64: "mouse",
    65: "remote", 66: "keyboard", 67: "cell phone", 68: "microwave",
    69: "oven", 70: "toaster", 71: "sink", 72: "refrigerator", 73: "book",
    74: "clock", 75: "vase", 76: "scissors", 77: "teddy bear",
    78: "hair drier", 79: "toothbrush",
}


def convert_annotations(dataset_dir, output_dir,
                        filename_template="im%05d.txt"):
    shutil.rmtree(output_dir, ignore_errors=True)
    os.makedirs(output_dir, exist_ok=True)
    video_classes = sorted((f for f in os.scandir(dataset_dir) if f.is_dir()),
                           key=lambda x: x.name)
    for video_class in video_classes:
        video_folders = sorted((f for f in os.scandir(video_class.path)
                                if f.is_dir()), key=lambda x: x.name)
        for video_folder in video_folders:
            source = sorted(glob(os.path.join(video_folder.path, "*.txt")))
            if not source:
                continue
            out_dir = os.path.join(output_dir, video_folder.name)
            out_ann = os.path.join(out_dir, "object_detection")
            shutil.rmtree(out_ann, ignore_errors=True)
            os.makedirs(out_ann, exist_ok=True)

            metadata = set()
            # sequence resolution encoded in the filenames: <name>_WxH_...
            shape = source[0].split("/")[-1].split("_")[1].split("x")
            width, height = int(shape[0]), int(shape[1])
            for i, ann_path in enumerate(source):
                rows = []
                with open(ann_path) as f:
                    for line in f.readlines():
                        e = line.split()
                        cx, cy, w, h = map(float, e[1:5])
                        x1 = max(0, min(int((cx - w / 2) * width), width - 1))
                        y1 = max(0, min(int((cy - h / 2) * height), height - 1))
                        x2 = max(0, min(int((cx + w / 2) * width), width - 1))
                        y2 = max(0, min(int((cy + h / 2) * height), height - 1))
                        label = int(e[0])
                        rows.append((label, x1, y1, x2, y2))
                        metadata.add(label)
                with open(os.path.join(out_ann, filename_template % i),
                          "w") as f:
                    for label, x1, y1, x2, y2 in rows:
                        f.write(f"{label} {x1} {y1} {x2} {y2}\n")

            with open(os.path.join(out_dir, "metadata.txt"), "w") as f:
                for class_id in sorted(metadata):
                    f.write(f"{class_id}: {COCO_CLASS_DICT[class_id]}\n")


def main():
    parser = argparse.ArgumentParser(
        description="SFU-HW-Objects dataset to dumps parser")
    parser.add_argument("--dataset-dir", dest="dataset_dir", type=str,
                        required=True)
    parser.add_argument("--output-dir", dest="output_dir", type=str,
                        required=True)
    args = parser.parse_args()
    convert_annotations(args.dataset_dir, args.output_dir)


if __name__ == "__main__":
    main()
