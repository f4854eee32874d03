#!/usr/bin/env python
"""Faithful CPU re-execution of the reference pipeline, for baseline numbers.

BASELINE.md's action item: the reference (Gautham-JS/ROS_Stereo_SLAM)
publishes no quantitative benchmarks, so parity/speedup claims need a
self-measured baseline.  Building the C++ package needs ROS+g2o+PCL+
Pangolin (not in this image), but its per-frame vision math is entirely
OpenCV — so this script re-executes the same pipeline with the same
OpenCV calls and parameters, on the same synthetic frames bench.py uses:

- dense grid keypoints, step 30            (src/tracking.cpp:4-12)
- stereo L->R ``calcOpticalFlowPyrLK``     (src/tracking.cpp:14-28)
- ``findFundamentalMat`` RANSAC 3.0px gate (src/tracking.cpp:30-43)
- ``triangulatePoints`` P1=K[I|0], P2=K[I|-b e1], b=0.54
                                           (src/triangulation.cpp:142-160)
- temporal ``calcOpticalFlowPyrLK`` + 8-point F 1.0 px
                                           (src/tracking.cpp:46-91)
- ``solvePnPRansac`` 100 it / 1.0 px / 0.99, retry at 8.0 px / 0.98,
  R<-R^T, t<- -R t inversion               (src/rosFuncs.cpp:73-94;
                                            src/VisualSLAM.cpp:71-74)
- keyframe trigger: PnP inliers < 200 -> re-triangulate current stereo
  pair, lift to world by current [R|t]     (src/VisualSLAM.cpp:120-146,
                                            src/keyFrameManagement.cpp:9-46)

Loop closure / PGO / rendering are NOT in the timed loop here — this is
the odometry frame loop (the same scope bench.py times).  Prints one
JSON line: {"reference_cpu_fps": ..., "ate_rmse_m": ...}.

Usage: python tools/reference_baseline.py [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

LK_PARAMS = dict(  # OpenCV defaults used by the reference (ROSslam.py:145)
    winSize=(21, 21),
    maxLevel=3,
    criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01),
)


def grid_keypoints(shape, step=30):
    h, w = shape
    ys, xs = np.mgrid[step // 2 : h - step // 2 : step,
                      step // 2 : w - step // 2 : step]
    return np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float32)


def stereo_triangulate(imL, imR, K, baseline, step=30):
    """denseKeypointExtractor + denseLKtracking + FmatThresholding +
    cv::triangulatePoints, as src/triangulation.cpp:73-166."""
    pts = grid_keypoints(imL.shape, step)
    nxt, st, _ = cv2.calcOpticalFlowPyrLK(imL, imR, pts, None, **LK_PARAMS)
    st = st.ravel().astype(bool)
    p0, p1 = pts[st], nxt[st]
    if len(p0) < 9:
        return np.zeros((0, 3), np.float32), np.zeros((0, 2), np.float32)
    _, inl = cv2.findFundamentalMat(p0, p1, cv2.FM_RANSAC, 3.0, 0.99)
    if inl is None:
        return np.zeros((0, 3), np.float32), np.zeros((0, 2), np.float32)
    inl = inl.ravel().astype(bool)
    p0, p1 = p0[inl], p1[inl]
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([np.eye(3), np.array([[-baseline], [0.0], [0.0]])])
    X = cv2.triangulatePoints(P1, P2, p0.T, p1.T)
    X = (X[:3] / X[3:4]).T.astype(np.float32)
    return X, p0


def run_pipeline(frames, K, b, full=False):
    """The timed reference frame loop over pre-rendered uint8 frames.

    `frames`: list of (left_u8, right_u8).  Returns (dt_seconds,
    (F, 4, 4) trajectory).  Callable from bench.py so the revisit row
    gets an apples-to-apples baseline measured on ITS OWN frames.
    """
    n_total = len(frames)
    orb_det = cv2.ORB_create(nfeatures=500) if full else None

    t0 = time.perf_counter()
    # frame-0 bootstrap (initSequence src/VisualSLAM.cpp:22-52)
    ref3d, ref2d = stereo_triangulate(frames[0][0], frames[0][1], K, b)
    T_wc = np.eye(4)
    traj = [T_wc.copy()]
    for i in range(1, n_total):
        imL, imR = frames[i]
        prevL = frames[i - 1][0]
        if orb_det is not None:
            # checkLoopDetectorStatus front half (optimizationStuff:50-55)
            orb_det.detectAndCompute(imL, None)
        # PyrLKtrackFrame2Frame (src/tracking.cpp:46-91)
        nxt, st, _ = cv2.calcOpticalFlowPyrLK(prevL, imL, ref2d, None, **LK_PARAMS)
        st = st.ravel().astype(bool)
        p3, p2 = ref3d[st], nxt[st]
        if len(p2) >= 9:
            _, inl = cv2.findFundamentalMat(
                ref2d[st], p2, cv2.FM_8POINT | cv2.FM_RANSAC, 1.0, 0.99
            )
            if inl is not None:
                inl = inl.ravel().astype(bool)
                p3, p2 = p3[inl], p2[inl]
        # solvePnPRansac + retry ladder (src/rosFuncs.cpp:73-94)
        n_inl = 0
        if len(p3) >= 6:
            ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                p3, p2, K, None, iterationsCount=100,
                reprojectionError=1.0, confidence=0.99,
            )
            if not ok or inliers is None or len(inliers) < 10:
                ok, rvec, tvec, inliers = cv2.solvePnPRansac(
                    p3, p2, K, None, iterationsCount=100,
                    reprojectionError=8.0, confidence=0.98,
                )
            if ok and inliers is not None:
                n_inl = len(inliers)
                R, _ = cv2.Rodrigues(rvec)
                # inversion as src/VisualSLAM.cpp:71-74
                Rw = R.T
                tw = -Rw @ tvec.ravel()
                T_wc = np.eye(4)
                T_wc[:3, :3] = Rw
                T_wc[:3, 3] = tw
        traj.append(T_wc.copy())
        # keyframe trigger (src/VisualSLAM.cpp:120-146)
        if n_inl < 200:
            X, p0 = stereo_triangulate(imL, imR, K, b)
            if len(X) >= 10:
                ref3d = (T_wc[:3, :3] @ X.T).T + T_wc[:3, 3]
                ref2d = p0
            # else keep previous set (reference degrades the same way)
        else:
            keep = st.copy()
            keep[st] = inl if inl is not None else True
            ref3d = ref3d[keep]
            ref2d = nxt[keep]
    dt = time.perf_counter() - t0
    return dt, np.stack(traj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--full", action="store_true",
                    help="add the reference's per-frame loop-detection "
                    "front half: ORB detectAndCompute on every frame "
                    "(src/optimizationStuff.cpp:50-55). The DBoW2 "
                    "transform+query+geometric check cannot be "
                    "re-executed (DBoW2 absent), so this remains a "
                    "CONSERVATIVE bar for the reference's full loop.")
    args = ap.parse_args()

    from ros_stereo_slam_tpu.config import CameraConfig
    from ros_stereo_slam_tpu.data.synthetic import SyntheticWorld
    from ros_stereo_slam_tpu.utils import metrics

    cam = CameraConfig()
    n_total = args.frames + 1
    world = SyntheticWorld(camera=cam, n_frames=n_total, seed=11, half_w=18.0)
    print(f"[ref] rendering {n_total} frames...", file=sys.stderr)
    frames = []
    for i in range(n_total):
        l, r, _ = world.render(i)
        frames.append((
            (np.clip(l, 0, 1) * 255).astype(np.uint8),
            (np.clip(r, 0, 1) * 255).astype(np.uint8),
        ))

    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    dt, est = run_pipeline(frames, K, cam.baseline, full=args.full)
    ate = metrics.ate_rmse(est, world.poses[: est.shape[0]])
    print(json.dumps({
        "reference_cpu_fps": round(args.frames / dt, 2),
        "ate_rmse_m": round(float(ate), 4),
        "frames": args.frames,
        "opencv": cv2.__version__,
    }))


if __name__ == "__main__":
    main()
