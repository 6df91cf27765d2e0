"""PnP head-pose estimation + runtime 3D face adaptation for the tracker.

Behavioral spec: the reference tracker's 3D stage — ``estimate_depth``
(OpenSeeFace/tracker.py:762-858: solvePnP against a canonical 70-point face,
per-landmark depth lifting, eyeball/pupil reconstruction, pnp error +
reset-on-anomaly), ``FaceInfo.normalize_pts3d`` (:383-398: roll-align on the
nose bridge, per-axis rescale to the canonical face), ``FaceInfo.adjust_3d``
(:400-477: confidence-weighted random-search refinement of the personal 3D
face with per-point update budgets), and ``matrix_to_quaternion``
(:118-137 — standard Shepperd decomposition). The coordinate pairing
follows the reference throughout: landmark rows are (y, x, conf) and the
camera matrix is built to match that ordering (:651-653).

``FACE_3D`` is the reference's canonical face model (tracker.py:577-650) —
model DATA, transcribed as-is.

Oracle tests: tests/test_headpose.py drives the reference's own methods on
stubbed objects and asserts agreement.
"""

from __future__ import annotations

import copy
from typing import Optional, Tuple

import numpy as np

# Canonical 70-point face (66 landmarks + 2 pupils + 2 eyeball centers);
# reference tracker.py:577-650.
FACE_3D = np.array([
    [0.4551769692672, 0.300895790030204, -0.764429433974752],
    [0.448998827123556, 0.166995837790733, -0.765143004071253],
    [0.437431554952677, 0.022655479179981, -0.739267175112735],
    [0.415033422928434, -0.088941454648772, -0.747947437846473],
    [0.389123587370091, -0.232380029794684, -0.704788385327458],
    [0.334630113904382, -0.361265387599081, -0.615587579236862],
    [0.263725112132858, -0.460009725616771, -0.491479221041573],
    [0.16241621322721, -0.558037146073869, -0.339445180872282],
    [0.0, -0.621079019321682, -0.287294770748887],
    [-0.16241621322721, -0.558037146073869, -0.339445180872282],
    [-0.263725112132858, -0.460009725616771, -0.491479221041573],
    [-0.334630113904382, -0.361265387599081, -0.615587579236862],
    [-0.389123587370091, -0.232380029794684, -0.704788385327458],
    [-0.415033422928434, -0.088941454648772, -0.747947437846473],
    [-0.437431554952677, 0.022655479179981, -0.739267175112735],
    [-0.448998827123556, 0.166995837790733, -0.765143004071253],
    [-0.4551769692672, 0.300895790030204, -0.764429433974752],
    [0.385529968662985, 0.402800553948697, -0.310031082540741],
    [0.322196658344302, 0.464439136821772, -0.250558059367669],
    [0.25409760441282, 0.46420381416882, -0.208177722146526],
    [0.186875436782135, 0.44706071961879, -0.145299823706503],
    [0.120880983543622, 0.423566314072968, -0.110757158774771],
    [-0.120880983543622, 0.423566314072968, -0.110757158774771],
    [-0.186875436782135, 0.44706071961879, -0.145299823706503],
    [-0.25409760441282, 0.46420381416882, -0.208177722146526],
    [-0.322196658344302, 0.464439136821772, -0.250558059367669],
    [-0.385529968662985, 0.402800553948697, -0.310031082540741],
    [0.0, 0.293332603215811, -0.137582088779393],
    [0.0, 0.194828701837823, -0.069158109325951],
    [0.0, 0.103844017393155, -0.009151819844964],
    [0.0, 0.0, 0.0],
    [0.080626352317973, -0.041276068128093, -0.134161035564826],
    [0.046439347377934, -0.057675223874769, -0.102990627164664],
    [0.0, -0.068753126205604, -0.090545348482397],
    [-0.046439347377934, -0.057675223874769, -0.102990627164664],
    [-0.080626352317973, -0.041276068128093, -0.134161035564826],
    [0.315905195966084, 0.298337502555443, -0.285107407636464],
    [0.275252345439353, 0.312721904921771, -0.244558251170671],
    [0.176394511553111, 0.311907184376107, -0.219205360345231],
    [0.131229723798772, 0.284447361805627, -0.234239149487417],
    [0.184124948330084, 0.260179585304867, -0.226590776513707],
    [0.279433549294448, 0.267363071770222, -0.248441437111633],
    [-0.131229723798772, 0.284447361805627, -0.234239149487417],
    [-0.176394511553111, 0.311907184376107, -0.219205360345231],
    [-0.275252345439353, 0.312721904921771, -0.244558251170671],
    [-0.315905195966084, 0.298337502555443, -0.285107407636464],
    [-0.279433549294448, 0.267363071770222, -0.248441437111633],
    [-0.184124948330084, 0.260179585304867, -0.226590776513707],
    [0.121155252430729, -0.208988660580347, -0.160606287940521],
    [0.041356305910044, -0.194484199722098, -0.096159882202821],
    [0.0, -0.205180167345702, -0.083299217789729],
    [-0.041356305910044, -0.194484199722098, -0.096159882202821],
    [-0.121155252430729, -0.208988660580347, -0.160606287940521],
    [-0.132325402795928, -0.290857984604968, -0.187067868218105],
    [-0.064137791831655, -0.325377847425684, -0.158924039726607],
    [0.0, -0.343742581679188, -0.113925986025684],
    [0.064137791831655, -0.325377847425684, -0.158924039726607],
    [0.132325402795928, -0.290857984604968, -0.187067868218105],
    [0.181481567104525, -0.243239316141725, -0.231284988892766],
    [0.083999507750469, -0.239717753728704, -0.155256465640701],
    [0.0, -0.256058040176369, -0.0950619498899],
    [-0.083999507750469, -0.239717753728704, -0.155256465640701],
    [-0.181481567104525, -0.243239316141725, -0.231284988892766],
    [-0.074036069749345, -0.250689938345682, -0.177346470406188],
    [0.0, -0.264945854681568, -0.112349967428413],
    [0.074036069749345, -0.250689938345682, -0.177346470406188],
    [0.257990002632141, 0.276080012321472, -0.219998998939991],
    [-0.257990002632141, 0.276080012321472, -0.219998998939991],
    [0.257990002632141, 0.276080012321472, -0.324570998549461],
    [-0.257990002632141, 0.276080012321472, -0.324570998549461],
], np.float32)

CONTOUR_PTS = (0, 1, 8, 15, 16, 27, 28, 29, 30, 31, 32, 33, 34, 35)


def matrix_to_quaternion(m: np.ndarray) -> np.ndarray:
    """Shepperd's rotation-matrix -> quaternion (branch on the largest
    diagonal combination for numerical stability; spec tracker.py:118-137)."""
    if m[2, 2] < 0:
        if m[0, 0] > m[1, 1]:
            t = 1 + m[0, 0] - m[1, 1] - m[2, 2]
            q = [t, m[0, 1] + m[1, 0], m[2, 0] + m[0, 2], m[1, 2] - m[2, 1]]
        else:
            t = 1 - m[0, 0] + m[1, 1] - m[2, 2]
            q = [m[0, 1] + m[1, 0], t, m[1, 2] + m[2, 1], m[2, 0] - m[0, 2]]
    else:
        if m[0, 0] < -m[1, 1]:
            t = 1 - m[0, 0] - m[1, 1] + m[2, 2]
            q = [m[2, 0] + m[0, 2], m[1, 2] + m[2, 1], t, m[0, 1] - m[1, 0]]
        else:
            t = 1 + m[0, 0] + m[1, 1] + m[2, 2]
            q = [m[1, 2] - m[2, 1], m[2, 0] - m[0, 2], m[0, 1] - m[1, 0], t]
    return np.asarray(q, np.float32) * 0.5 / np.sqrt(t)


class HeadPoseEstimator:
    """Per-face 3D state: solvePnP pose, per-landmark depth lifting, and the
    personal-face random-search refinement. One instance per tracked face."""

    def __init__(self, width: int, height: int):
        self.camera = np.array([[width, 0, width / 2],
                                [0, width, height / 2],
                                [0, 0, 1]], np.float32)
        self.inverse_camera = np.linalg.inv(self.camera)
        self.dist_coeffs = np.zeros((4, 1))
        self.face_3d = FACE_3D.copy()
        self.contour_pts = list(CONTOUR_PTS)
        self.contour = self.face_3d[self.contour_pts].astype(np.float64)
        self.rotation: Optional[np.ndarray] = None
        self.translation = np.array([0.0, 0.0, 0.0], np.float32)
        self.update_counts = np.zeros((66, 2))
        self.update_count_delta = 75.0
        self.update_count_max = 7500.0
        self.fail_count = 0
        self.base_scale_v = (self.face_3d[27:30, 1] - self.face_3d[28:31, 1])
        self.base_scale_h = np.abs(self.face_3d[[0, 36, 42], 0]
                                   - self.face_3d[[16, 39, 45], 0])

    def _update_contour(self):
        self.contour = np.array(self.face_3d[self.contour_pts],
                                dtype=np.float64)

    # -- estimate_depth (spec tracker.py:762-858) --------------------------

    def estimate(self, lms66: np.ndarray, eye_state: np.ndarray):
        """lms66: [66, 3] rows (y, x, conf); eye_state: [2, 4] rows
        [open, y, x, conf]. Returns (success, quaternion, euler, pnp_error,
        pts_3d [70, 3], lms [70, 3])."""
        import cv2

        lms = np.concatenate((
            lms66,
            np.array([[eye_state[0][1], eye_state[0][2], eye_state[0][3]],
                      [eye_state[1][1], eye_state[1][2], eye_state[1][3]]],
                     np.float64)), 0)
        image_pts = np.array(lms)[self.contour_pts, 0:2]

        if self.rotation is not None:
            success, rotation, translation = cv2.solvePnP(
                self.contour, image_pts, self.camera, self.dist_coeffs,
                useExtrinsicGuess=True, rvec=np.transpose(self.rotation),
                tvec=np.transpose(self.translation),
                flags=cv2.SOLVEPNP_ITERATIVE)
        else:
            rvec = np.array([0, 0, 0], np.float32)
            tvec = np.array([0, 0, 0], np.float32)
            success, rotation, translation = cv2.solvePnP(
                self.contour, image_pts, self.camera, self.dist_coeffs,
                useExtrinsicGuess=True, rvec=rvec, tvec=tvec,
                flags=cv2.SOLVEPNP_ITERATIVE)

        pts_3d = np.zeros((70, 3), np.float32)
        if not success:
            self.rotation = np.array([0.0, 0.0, 0.0], np.float32)
            self.translation = np.array([0.0, 0.0, 0.0], np.float32)
            return False, np.zeros(4), np.zeros(3), 99999.0, pts_3d, lms
        # flat (3,) vectors: the reference relies on the OLD cv2 in-place
        # useExtrinsicGuess contract that returned the (3,) guess arrays —
        # modern cv2 returns (3, 1), which breaks its own downstream
        # broadcasting (tracker.py:833); normalizing here restores the
        # historical semantics
        self.rotation = np.asarray(rotation).reshape(3)
        self.translation = np.asarray(translation).reshape(3)

        rmat, _ = cv2.Rodrigues(rotation)
        inverse_rotation = np.linalg.inv(rmat)

        t_reference = self.face_3d.dot(rmat.transpose()) + self.translation
        t_reference = t_reference.dot(self.camera.transpose())
        t_depth = t_reference[:, 2]
        t_depth[t_depth == 0] = 0.000001
        t_depth_e = t_depth[:, None]
        t_reference = t_reference / t_depth_e
        pts_3d[0:66] = (np.stack(
            [lms[0:66, 0], lms[0:66, 1], np.ones((66,))], 1) * t_depth_e[0:66])
        pts_3d[0:66] = (pts_3d[0:66].dot(self.inverse_camera.transpose())
                        - self.translation).dot(inverse_rotation.transpose())
        pnp_error = np.power(lms[0:17, 0:2] - t_reference[0:17, 0:2], 2).sum()
        pnp_error += np.power(lms[30, 0:2] - t_reference[30, 0:2], 2).sum()
        if np.isnan(pnp_error):
            pnp_error = 9999999.0

        for i, _pt in enumerate(self.face_3d[66:70]):
            if i == 2:
                # eyeball centers: 0.385 · corner distance behind the
                # corner midpoint (12.5 mm eyeball vs 30-35 mm eye width)
                eye_center = (pts_3d[36] + pts_3d[39]) / 2.0
                depth = 0.385 * np.linalg.norm(pts_3d[36] - pts_3d[39])
                pts_3d[68] = np.array([eye_center[0], eye_center[1],
                                       eye_center[2] - depth])
                continue
            if i == 3:
                eye_center = (pts_3d[42] + pts_3d[45]) / 2.0
                depth = 0.385 * np.linalg.norm(pts_3d[42] - pts_3d[45])
                pts_3d[69] = np.array([eye_center[0], eye_center[1],
                                       eye_center[2] - depth])
                continue
            if i == 0:
                d1 = np.linalg.norm(lms[66, 0:2] - lms[36, 0:2])
                d2 = np.linalg.norm(lms[66, 0:2] - lms[39, 0:2])
                pt = (pts_3d[36] * d1 + pts_3d[39] * d2) / (d1 + d2)
            else:
                d1 = np.linalg.norm(lms[67, 0:2] - lms[42, 0:2])
                d2 = np.linalg.norm(lms[67, 0:2] - lms[45, 0:2])
                pt = (pts_3d[42] * d1 + pts_3d[45] * d2) / (d1 + d2)
            reference = rmat.dot(pt) + self.translation
            reference = self.camera.dot(reference)
            depth = reference[2]
            pt_3d = np.array([lms[66 + i][0] * depth,
                              lms[66 + i][1] * depth, depth], np.float32)
            pt_3d = self.inverse_camera.dot(pt_3d) - self.translation
            pts_3d[66 + i, :] = inverse_rotation.dot(pt_3d)
        pts_3d[np.isnan(pts_3d).any(axis=1)] = np.array([0.0, 0.0, 0.0],
                                                        np.float32)

        pnp_error = np.sqrt(pnp_error / (2.0 * image_pts.shape[0]))
        if pnp_error > 300:
            self.fail_count += 1
            if self.fail_count > 5:
                # anomalous personal-face fit: reset the adapted model
                self.face_3d = FACE_3D.copy()
                self.rotation = None
                self.translation = np.array([0.0, 0.0, 0.0], np.float32)
                self.update_counts = np.zeros((66, 2))
                self._update_contour()
        else:
            self.fail_count = 0

        euler = cv2.RQDecomp3x3(rmat)[0]
        return (True, matrix_to_quaternion(rmat), euler, pnp_error, pts_3d,
                lms)

    # -- normalize_pts3d (spec tracker.py:383-398) -------------------------

    def normalize_pts3d(self, pts_3d: np.ndarray) -> np.ndarray:
        pts_3d = pts_3d.copy()
        pts_3d[:, 0:2] -= pts_3d[30, 0:2]
        d = pts_3d[27, 0:2] - pts_3d[30, 0:2]
        alpha = float(np.arctan2(d[1], d[0]) % (2 * np.pi)) - np.deg2rad(90)
        R = np.array([[np.cos(alpha), -np.sin(alpha)],
                      [np.sin(alpha), np.cos(alpha)]])
        pts_3d[:, 0:2] = ((pts_3d - pts_3d[30])[:, 0:2].dot(R)
                          + pts_3d[30, 0:2])
        pts_3d[:, 1] /= np.mean((pts_3d[27:30, 1] - pts_3d[28:31, 1])
                                / self.base_scale_v)
        pts_3d[:, 0] /= np.mean(np.abs(pts_3d[[0, 36, 42], 0]
                                       - pts_3d[[16, 39, 45], 0])
                                / self.base_scale_h)
        return pts_3d

    # -- adjust_3d (spec tracker.py:400-477) -------------------------------

    def adjust(self, lms: np.ndarray, conf: float, euler: np.ndarray,
               pnp_error: float, static_model: bool = False,
               limit: bool = True) -> None:
        """Random-search refinement of the personal 3D face toward the
        observed landmarks, gated by pose and per-point update budgets."""
        import cv2

        if conf < 0.4 or pnp_error > 300 or static_model:
            return
        eligible = np.delete(np.arange(0, 66), [30])
        changed_any = False
        update_type = -1
        d_o = np.ones((66,))
        d_c = np.ones((66,))
        updated = None
        o_projected = None
        for runs in range(1):
            r = 1.0 + np.random.random_sample((66, 3)) * 0.02 - 0.01
            r[30, :] = 1.0
            if -165 < euler[0] < 145:
                continue
            elif -10 < euler[1] < 20:
                r[:, 2] = 1.0
                update_type = 0
            else:
                r[:, 0:2] = 1.0
                if euler[2] > 120 or euler[2] < 60:
                    continue
                elif euler[1] < -10:
                    update_type = 1
                    r[[0, 1, 2, 3, 4, 5, 6, 7, 17, 18, 19, 20, 21, 31, 32,
                       36, 37, 38, 39, 40, 41, 48, 49, 56, 57, 58, 59, 65],
                      2] = 1.0
                    eligible = [8, 9, 10, 11, 12, 13, 14, 15, 16, 22, 23, 24,
                                25, 26, 27, 28, 29, 33, 34, 35, 42, 43, 44,
                                45, 46, 47, 50, 51, 52, 53, 54, 55, 60, 61,
                                62, 63, 64]
                else:
                    update_type = 1
                    r[[9, 10, 11, 12, 13, 14, 15, 16, 22, 23, 24, 25, 26,
                       34, 35, 42, 43, 44, 45, 46, 47, 51, 52, 53, 54, 61,
                       62, 63], 2] = 1.0
                    eligible = [0, 1, 2, 3, 4, 5, 6, 7, 8, 17, 18, 19, 20,
                                21, 27, 28, 29, 31, 32, 33, 36, 37, 38, 39,
                                40, 41, 48, 49, 50, 55, 56, 57, 58, 59, 60,
                                64, 65]
            if limit:
                eligible = np.nonzero(
                    self.update_counts[:, update_type]
                    < self.update_counts[:, abs(update_type - 1)]
                    + self.update_count_delta)[0]
                if eligible.shape[0] <= 0:
                    break
            if runs == 0:
                updated = copy.copy(self.face_3d[0:66])
                o_projected = np.ones((66, 2))
                o_projected[eligible] = np.squeeze(np.array(cv2.projectPoints(
                    self.face_3d[eligible], self.rotation, self.translation,
                    self.camera, self.dist_coeffs)[0]), 1)
            c = updated * r
            c_projected = np.zeros((66, 2))
            c_projected[eligible] = np.squeeze(np.array(cv2.projectPoints(
                c[eligible], self.rotation, self.translation, self.camera,
                self.dist_coeffs)[0]), 1)
            changed = False
            d_o[eligible] = np.linalg.norm(
                o_projected[eligible] - lms[eligible, 0:2], axis=1)
            d_c[eligible] = np.linalg.norm(
                c_projected[eligible] - lms[eligible, 0:2], axis=1)
            indices = np.nonzero(d_c < d_o)[0]
            if indices.shape[0] > 0:
                if limit:
                    indices = np.intersect1d(indices, eligible)
                if indices.shape[0] > 0:
                    self.update_counts[indices, update_type] += 1
                    updated[indices] = c[indices]
                    o_projected[indices] = c_projected[indices]
                    changed = True
            changed_any = changed_any or changed
            if not changed:
                break

        if changed_any:
            weights = np.zeros((66, 3))
            weights[:, :] = lms[0:66, 2:3]
            weights[weights > 0.7] = 1.0
            weights = 1.0 - weights
            update_indices = np.arange(0, 66)
            if limit:
                update_indices = np.nonzero(
                    self.update_counts[:, update_type]
                    <= self.update_count_max)[0]
            self.face_3d[update_indices] = (
                self.face_3d[update_indices] * weights[update_indices]
                + updated[update_indices] * (1.0 - weights[update_indices]))
            self._update_contour()
