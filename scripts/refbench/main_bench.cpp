// Headless benchmark driver for the C++ reference engine.
//
// Compiles AGAINST the read-only reference sources (never copied into
// this repo): mylsd/myrdp/myfa from /root/reference/LSD.  This is our
// own driver, written fresh, that reproduces the reference Windows
// driver's frame-loop semantics (LSD/main_on_windows.cpp:16-195) minus
// the OpenCV display calls, so the reference's true throughput and pose
// trace can be measured on this machine and compared against lsdtpu
// (see scripts/refbench/run.sh and docs/RESULTS.md).
//
// Usage: lsd_refbench <dataset_dir> [max_frames] [pose_dump.txt] [map_dump_dir]
//   prints: map-prep seconds, frame-loop seconds, scans/s, final pose
//   dumps:  one "x y ang" row per frame (pixel coords, like kalman_x);
//           with map_dump_dir: maplines.txt (10-column structLinesInfo
//           rows, the MaplinesInfo.txt golden-dump format) and
//           mapcache.txt (row-major doubles) of the engine's actual
//           map artifacts, for direct parity checks against lsdtpu
//           (scripts/refbench/parity_map.py).  pose_dump "-" = none.

#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <ctime>
#include <string>
#include <vector>

#include <opencv.hpp>
#include <myLSD.h>
#include <myRDP.h>
#include <myFA.h>
#include <baseFunc.h>

static double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <dataset_dir> [max_frames] [pose_dump]\n",
                     argv[0]);
        return 2;
    }
    std::string dir = argv[1];
    if (!dir.empty() && dir.back() != '/') dir += '/';
    long max_frames = (argc > 2) ? std::atol(argv[2]) : -1;
    const char *dump_path = (argc > 3) ? argv[3] : nullptr;
    if (dump_path && std::string(dump_path) == "-") dump_path = nullptr;
    const char *map_dump_dir = (argc > 4) ? argv[4] : nullptr;

    // ---- map parameters -------------------------------------------------
    structMapParam mapParam;
    {
        FILE *fp = std::fopen((dir + "mapParam.txt").c_str(), "r");
        if (!fp) { std::perror("mapParam.txt"); return 1; }
        if (std::fscanf(fp, "%d %d %lf %lf %lf", &mapParam.oriMapCol,
                        &mapParam.oriMapRow, &mapParam.mapResol,
                        &mapParam.mapOriX, &mapParam.mapOriY) != 5) {
            std::fprintf(stderr, "bad mapParam.txt\n");
            return 1;
        }
        std::fclose(fp);
    }
    const int cols = mapParam.oriMapCol, rows = mapParam.oriMapRow;

    // ---- occupancy grid (row-major ints -> CV_8UC1) ----------------------
    cv::Mat mapValue = cv::Mat::zeros(rows, cols, CV_8UC1);
    {
        FILE *fp = std::fopen((dir + "mapValue.txt").c_str(), "r");
        if (!fp) { std::perror("mapValue.txt"); return 1; }
        for (int r = 0; r < rows; r++) {
            uint8_t *row = mapValue.ptr<uint8_t>(r);
            for (int c = 0; c < cols; c++) {
                int v;
                if (std::fscanf(fp, "%d", &v) != 1) v = 0;
                row[c] = (uint8_t)v;
            }
        }
        std::fclose(fp);
    }

    // ---- odometry: the reference's feof-loop appends one duplicate last
    // row (fscanf fails at EOF, the stale struct is still pushed), then
    // forces Odom[0].x = 0 -- both preserved here ------------------------
    std::vector<structPosition> odom;
    {
        FILE *fp = std::fopen((dir + "Odom.txt").c_str(), "r");
        if (!fp) { std::perror("Odom.txt"); return 1; }
        structPosition o{0, 0, 0};
        while (!std::feof(fp)) {
            std::fscanf(fp, "%lf %lf %lf", &o.x, &o.y, &o.ang);
            odom.push_back(o);
        }
        std::fclose(fp);
        odom[0].x = 0;
    }

    // ---- offline map prep: cache first (pre-remap values), then LSD
    // (which remaps the grid in place), as the reference driver does ------
    double t0 = now_s();
    cv::Mat mapCache = mylsd::createMapCache(mapValue, mapParam.mapResol);
    mylsd::structLSD LSD = mylsd::myLineSegmentDetector(
        mapValue, cols, rows, lsd_sca, lsd_sig, lsd_angThre, lsd_denThre,
        pseBin);
    double t_prep = now_s() - t0;
    std::printf("map prep: %.3f s (%d lines)\n", t_prep, LSD.len_linesInfo);

    if (map_dump_dir) {
        std::string md = map_dump_dir;
        if (!md.empty() && md.back() != '/') md += '/';
        FILE *fl = std::fopen((md + "maplines.txt").c_str(), "w");
        for (int i = 0; i < LSD.len_linesInfo; i++) {
            const structLinesInfo &li = LSD.linesInfo[i];
            std::fprintf(fl, "%.17g %.17g %.17g %.17g %.17g %.17g %.17g "
                         "%.17g %.17g %.17g\n", li.k, li.b, li.dx, li.dy,
                         li.x1, li.y1, li.x2, li.y2, li.len, li.orient);
        }
        std::fclose(fl);
        FILE *fc = std::fopen((md + "mapcache.txt").c_str(), "w");
        for (int r = 0; r < rows; r++) {
            const double *row = mapCache.ptr<double>(r);
            for (int c = 0; c < cols; c++)
                std::fprintf(fc, "%.17g ", row[c]);
            std::fprintf(fc, "\n");
        }
        std::fclose(fc);
        std::printf("map artifacts dumped to %s\n", md.c_str());
        if (max_frames == 0) return 0;
    }

    cv::Mat display;  // dead field in structFAInput; never read by myfa

    // ---- filter init ----------------------------------------------------
    structPosition lastPose{-1, -1, 0};
    Eigen::Matrix<double, 9, 1> kx;
    kx << -1, -1, 0, 0, 0, 0, 0, 0, 0;
    Eigen::Matrix<double, 9, 9> kP = Eigen::Matrix<double, 9, 9>::Zero();
    for (int i = 0; i < 3; i++) kP(i, i) = 100;
    for (int i = 3; i < 6; i++) kP(i, i) = 1;
    for (int i = 6; i < 9; i++) kP(i, i) = 0.1;

    FILE *dump = dump_path ? std::fopen(dump_path, "w") : nullptr;

    // ---- frame loop ------------------------------------------------------
    FILE *fp = std::fopen((dir + "Lidar.txt").c_str(), "r");
    if (!fp) { std::perror("Lidar.txt"); return 1; }
    myrdp::structLidarPointPolar polar[360];
    std::vector<double> angRotate;
    bool is_offset = false;
    long cnt_frame = 0, frames_done = 0;
    double t_loop0 = now_s();
    while (!std::feof(fp)) {
        cnt_frame++;
        int len_lp = 0;
        bool hit_eof = false;
        for (int i = 0; i < pointPerLoop; i++) {
            if (std::feof(fp)) { hit_eof = true; break; }
            double range = 0, angle = 0;
            std::fscanf(fp, "%lf%lf", &range, &angle);
            if (range != INFINITY) {
                polar[len_lp].range = range;
                polar[len_lp].angle = angle;
                polar[len_lp].split = false;
                len_lp++;
            }
        }
        if (!hit_eof) {
            myrdp::structFeatureScan FS = myrdp::FeatureScan(
                mapParam, polar, len_lp, rdp_leastPoint, rdp_threLine,
                rdp_leastDist);

            // odometry delta rotated by the accumulated mean offset theta
            // (faithful to main_on_windows.cpp:132-153 incl. the y-term
            // using tempScanPose.y twice)
            structPosition scanPose{0, 0, 0};
            double theta = 0;
            if (std::abs(kx(0) + 1) >= 0.0001) {
                for (double a : angRotate) theta += a;
                theta /= (double)angRotate.size();
                double tx = (odom[cnt_frame].x - odom[cnt_frame - 1].x) /
                            mapParam.mapResol;
                double ty = (odom[cnt_frame].y - odom[cnt_frame - 1].y) /
                            mapParam.mapResol;
                scanPose.x = tx * cosd(theta) - ty * sind(theta);
                scanPose.y = ty * sind(theta) + ty * cosd(theta);
                scanPose.ang = atand(odom[cnt_frame].ang -
                                     odom[cnt_frame - 1].ang);
            }

            // repack into the FA input (trans2FA semantics: copies 9 of the
            // 10 linesInfo fields -- orient dropped -- and rounds lidarPos)
            myfa::structFAInput fa;
            fa.scanLinesInfo.assign(FS.linesInfo,
                                    FS.linesInfo + FS.len_linesInfo);
            fa.mapLinesInfo.assign(LSD.linesInfo,
                                   LSD.linesInfo + LSD.len_linesInfo);
            for (auto &li : fa.scanLinesInfo) li.orient = 0;
            for (auto &li : fa.mapLinesInfo) li.orient = 0;
            fa.scanImPoint = FS.scanImPoint;
            fa.mapCache = mapCache;
            fa.Display = display;
            fa.lidarPose.x = (int)std::round(FS.lidarPos.x);
            fa.lidarPose.y = (int)std::round(FS.lidarPos.y);
            fa.lastPose = lastPose;
            fa.ScanPose = scanPose;
            fa.kalman_x = kx;
            fa.kalman_P = kP;

            myfa::structFAOutput out = myfa::FeatureAssociation(&fa);
            kx = out.kalman_x;
            kP = out.kalman_P;
            lastPose.x = kx(0);
            lastPose.y = kx(1);
            lastPose.ang = kx(2);

            double angDiff = kx(2) - atand(odom[cnt_frame].ang);
            if (std::abs(angDiff) > 90 && cnt_frame == 1) is_offset = true;
            if (is_offset && angDiff < 0) angDiff += 360;
            angRotate.push_back(angDiff);

            frames_done++;
            if (dump)
                std::fprintf(dump, "%.17g %.17g %.17g\n", kx(0), kx(1),
                             kx(2));
        }
        if (cnt_frame >= (long)odom.size() - 1) break;
        if (max_frames > 0 && frames_done >= max_frames) break;
    }
    double t_loop = now_s() - t_loop0;
    std::fclose(fp);
    if (dump) std::fclose(dump);

    std::printf("frames: %ld in %.3f s = %.1f scans/s\n", frames_done,
                t_loop, frames_done / t_loop);
    std::printf("final pose: %.4f %.4f %.4f\n", kx(0), kx(1), kx(2));
    return 0;
}
