"""Video probing utilities (reference core/utils/video.py:4-37)."""

from __future__ import annotations


def get_video_length(video_path: str, from_header: bool = True) -> int:
    import cv2 as cv

    cap = cv.VideoCapture(video_path)
    if not cap.isOpened():
        return 0
    if from_header:
        length = int(cap.get(cv.CAP_PROP_FRAME_COUNT))
        cap.release()
        return length
    count = 0
    while True:
        ret, _ = cap.read()
        if not ret:
            break
        count += 1
    cap.release()
    return count


def get_video_resolution(video_path: str):
    import cv2 as cv

    cap = cv.VideoCapture(video_path)
    if not cap.isOpened():
        return 0, 0
    w = int(cap.get(cv.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return w, h
