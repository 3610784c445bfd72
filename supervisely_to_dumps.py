"""Supervisely video annotations -> per-frame txt dumps + PNG frames.

Port of the reference supervisely_to_dumps.py:83-225: per video, emits
object_detection/ (label x1 y1 x2 y2), license_detection/ (x1 y1 x2 y2) and
license_recognition/ (text x1 y1 x2 y2) dumps depending on the video type
suffix (_short vs _liplates), splits the video to images/imNNNNN.png
(ffmpeg or cv2 fallback), and writes the class-map metadata.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from glob import glob

COCO_CLASS_ID_MAP = {
    "person": 1, "bicycle": 2, "car": 3, "motorcycle": 4, "bus": 6,
    "truck": 8,
}


def convert_anno(path, result_root, video_filename, yolo_class_id_map,
                 filename_template="im%05d.txt"):
    video_type = video_filename.split("_")[-1]

    dirs = {}
    if video_type == "short":
        dirs["object_detection"] = os.path.join(
            result_root, video_filename, "object_detection")
    if video_type == "liplates":
        dirs["license_detection"] = os.path.join(
            result_root, video_filename, "license_detection")
        dirs["license_recognition"] = os.path.join(
            result_root, video_filename, "license_recognition")
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    with open(path) as f:
        data = json.load(f)

    obj_class_map = {obj["key"]: obj["classTitle"]
                     for obj in data["objects"]}

    for frame_data in data["frames"]:
        frame_id = frame_data["index"] + 1
        boxes, labels = [], []
        lp_boxes, lpr_boxes, lpr_texts = [], [], []
        for figure in frame_data["figures"]:
            class_name = obj_class_map[figure["objectKey"]]
            (x1, y1), (x2, y2) = figure["geometry"]["points"]["exterior"]
            if class_name == "liplate":
                lp_boxes.append([x1, y1, x2, y2])
                text = None
                for obj in data["objects"]:
                    if obj["key"] == figure["objectKey"]:
                        for tag in obj.get("tags", []):
                            if tag["name"] == "text":
                                text = tag["value"]
                                break
                lpr_boxes.append([x1, y1, x2, y2])
                lpr_texts.append(text)
            else:
                boxes.append([x1, y1, x2, y2])
                labels.append(yolo_class_id_map[class_name])

        if video_type == "short":
            with open(os.path.join(dirs["object_detection"],
                                   filename_template % frame_id), "w") as f:
                for label, box in zip(labels, boxes):
                    f.write("%d %d %d %d %d\n" % (label, *box))
        if video_type == "liplates":
            with open(os.path.join(dirs["license_detection"],
                                   filename_template % frame_id), "w") as f:
                for box in lp_boxes:
                    f.write("%d %d %d %d\n" % tuple(box))
            with open(os.path.join(dirs["license_recognition"],
                                   filename_template % frame_id), "w") as f:
                for text, box in zip(lpr_texts, lpr_boxes):
                    f.write("%s %d %d %d %d\n" % (text, *box))


def video_to_images(video_path, out_template):
    if shutil.which("ffmpeg") is not None:
        from subprocess import call
        call(["ffmpeg", "-i", video_path, out_template])
        return
    import cv2 as cv

    cap = cv.VideoCapture(video_path)
    i = 1
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        cv.imwrite(out_template % i, frame)
        i += 1
    cap.release()


def main():
    parser = argparse.ArgumentParser(
        description="Supervisely annotations to dumps")
    parser.add_argument("--anno-dir", dest="anno_dir", type=str, required=True,
                        help="directory of Supervisely *.mp4.json annotations")
    parser.add_argument("--video-dir", dest="video_dir", type=str,
                        required=True)
    parser.add_argument("--out-path", dest="out_path", type=str, required=True)
    args = parser.parse_args()

    anno_paths = sorted(glob(os.path.join(args.anno_dir, "*.json")))
    for anno_path in anno_paths:
        video_filename = os.path.basename(anno_path)
        for suffix in (".mp4.json", ".json"):
            if video_filename.endswith(suffix):
                video_filename = video_filename[: -len(suffix)]
                break
        video_path = os.path.join(args.video_dir, video_filename + ".mp4")
        convert_anno(anno_path, args.out_path, video_filename,
                     COCO_CLASS_ID_MAP)
        if os.path.exists(video_path):
            images_path = os.path.join(args.out_path, video_filename,
                                       "images")
            shutil.rmtree(images_path, ignore_errors=True)
            os.makedirs(images_path, exist_ok=True)
            video_to_images(video_path,
                            os.path.join(images_path, "im%05d.png"))

    with open(os.path.join(args.out_path, "metadata.txt"), "w") as f:
        for cls, number in COCO_CLASS_ID_MAP.items():
            f.write(f"{number}: {cls}\n")


if __name__ == "__main__":
    main()
