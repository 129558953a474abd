// Per-seed LSD trace of the REAL reference engine, for root-causing
// line-set parity residuals (scripts/refbench/parity_trace.py).
//
// Drives the reference's own exported internals (myLSD.h:131-141:
// GaussianSampler, RegionGrower, RectangleConverter, Refiner,
// RectangleImprover) through the same orchestration the engine's
// myLineSegmentDetector performs (myLSD.cpp:129-272), printing one
// record per processed seed:
//
//   SEED <i> <x> <y> <reg.num> <refine_ok> <num2> <x1> <y1> <x2> <y2>
//        <wid> <p> <logNFA> <accepted>
//
// (coordinates in the DOWNSAMPLED frame, pre-rescale).  Freshly
// written diagnostic driver - no reference code copied; compiled
// against the read-only sources like main_bench.cpp.
//
// Usage: lsd_trace <dataset_dir>

#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <string>
#include <vector>

#include <opencv2/core.hpp>

#include "baseFunc.h"
#include "myLSD.h"

static const double pi = 4.0 * atan(1.0);   // as myLSD.cpp:9

static cv::Mat load_map(const std::string &dir, int &col, int &row,
                        double &resol) {
    double ox, oy;
    FILE *fp = std::fopen((dir + "/mapParam.txt").c_str(), "r");
    if (!fp) { std::perror("mapParam"); std::exit(1); }
    if (std::fscanf(fp, "%d %d %lf %lf %lf", &col, &row, &resol,
                    &ox, &oy) != 5) std::exit(1);
    std::fclose(fp);
    cv::Mat m = cv::Mat::zeros(row, col, CV_8UC1);
    fp = std::fopen((dir + "/mapValue.txt").c_str(), "r");
    if (!fp) { std::perror("mapValue"); std::exit(1); }
    for (int y = 0; y < row; y++)
        for (int x = 0; x < col; x++) {
            int v; if (std::fscanf(fp, "%d", &v) != 1) std::exit(1);
            m.ptr<uint8_t>(y)[x] = (uint8_t)v;
        }
    std::fclose(fp);
    return m;
}

int main(int argc, char **argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s <dir>\n", argv[0]);
                    return 2; }
    int oriMapCol, oriMapRow; double resol;
    cv::Mat MapGray = load_map(argv[1], oriMapCol, oriMapRow, resol);

    const double sca = 0.3, sig = 0.6, angThre = 22.5, denThre = 0.7;
    const int pseBin = 1024;

    // --- prologue: remap + Gaussian + gradient (myLSD.cpp:132-174) ---
    int newMapCol = (int)floor(oriMapCol * sca);
    int newMapRow = (int)floor(oriMapRow * sca);
    for (int y = 1; y < oriMapRow; y++)
        for (int x = 1; x < oriMapCol; x++) {
            uint8_t &v = MapGray.ptr<uint8_t>(y)[x];
            if (v == 1) v = 255; else if (v == 255) v = 0;
        }
    cv::Mat GaussImage = mylsd::GaussianSampler(MapGray, sca, sig);
    cv::Mat usedMap = cv::Mat::zeros(newMapRow, newMapCol, CV_8UC1);
    cv::Mat degMap = cv::Mat::zeros(newMapRow, newMapCol, CV_64FC1);
    cv::Mat magMap = cv::Mat::zeros(newMapRow, newMapCol, CV_64FC1);
    double degThre = angThre / 180.0 * pi;
    double gradThre = 2.0 / sin(degThre);
    double maxGrad = 0;
    for (int y = 1; y < newMapRow; y++)
        for (int x = 1; x < newMapCol; x++) {
            double A = GaussImage.ptr<double>(y)[x];
            double B = GaussImage.ptr<double>(y)[x - 1];
            double C = GaussImage.ptr<double>(y - 1)[x];
            double D = GaussImage.ptr<double>(y - 1)[x - 1];
            double gX = (B + D - A - C) / 2.0;
            double gY = (C + D - A - B) / 2.0;
            double mag = sqrt(pow(gX, 2) + pow(gY, 2));
            magMap.ptr<double>(y)[x] = mag;
            if (mag < gradThre) usedMap.ptr<uint8_t>(y)[x] = 1;
            if (maxGrad < mag) maxGrad = mag;
            double deg = atan2(gX, -gY);
            if (fabs(deg - pi) < 0.000001) deg = 0;
            degMap.ptr<double>(y)[x] = deg;
        }

    // --- seed ordering (myLSD.cpp:176-204): quantize + libc qsort ---
    std::vector<mylsd::nodeBinCell> cells;
    double zoom = 1.0 * pseBin / maxGrad;
    for (int y = 0; y < newMapRow; y++)
        for (int x = 0; x < newMapCol; x++) {
            int v = (int)floor(magMap.ptr<double>(y)[x] * zoom);
            if (v > pseBin) v = pseBin;
            if (v != 0) cells.push_back({v, x, y});
        }
    std::qsort(cells.data(), cells.size(), sizeof(mylsd::nodeBinCell),
               mylsd::Comp);
    std::printf("META %d %d %zu %.17g\n", newMapCol, newMapRow,
                cells.size(), maxGrad);
    {   // bitwise field checksums (xor of raw double bits)
        unsigned long long hg = 0, hd = 0, hm = 0;
        for (int y = 0; y < newMapRow; y++)
            for (int x = 0; x < newMapCol; x++) {
                union { double d; unsigned long long u; } cg, cd, cm;
                cg.d = GaussImage.ptr<double>(y)[x];
                cd.d = degMap.ptr<double>(y)[x];
                cm.d = magMap.ptr<double>(y)[x];
                hg ^= cg.u + 0x9e3779b97f4a7c15ULL * (y * newMapCol + x);
                hd ^= cd.u + 0x9e3779b97f4a7c15ULL * (y * newMapCol + x);
                hm ^= cm.u + 0x9e3779b97f4a7c15ULL * (y * newMapCol + x);
            }
        std::printf("FIELDHASH %llu %llu %llu\n", hg, hd, hm);
    }

    double logNT = 5 * (log10((double)newMapRow) +
                        log10((double)newMapCol)) / 2.0;
    double regThre = -logNT / log10(angThre / 180.0);
    double aliPro = angThre / 180.0;

    // --- seed loop (myLSD.cpp:219-272) with per-seed records ---
    for (size_t i = 0; i < cells.size(); i++) {
        int xIdx = cells[i].x, yIdx = cells[i].y;
        if (usedMap.ptr<uint8_t>(yIdx)[xIdx] != 0) continue;
        mylsd::structRegionGrower RG = mylsd::RegionGrower(
            xIdx, yIdx, usedMap, degMap.ptr<double>(yIdx)[xIdx],
            degMap, degThre);
        mylsd::structReg reg = RG.reg;
        if (getenv("TRACE_SEED") && i == (size_t)atol(getenv("TRACE_SEED"))) {
            std::printf("GROW0 %d:", reg.num);
            for (int k = 0; k < reg.num; k++)
                std::printf(" %d,%d", reg.regPts_x[k], reg.regPts_y[k]);
            std::printf("\nGROWDEG %.17g\n", reg.deg);
        }
        if (reg.num < regThre) {
            std::printf("SEED %zu %d %d %d small\n", i, xIdx, yIdx,
                        reg.num);
            free(reg.regPts_x); free(reg.regPts_y);
            continue;
        }
        mylsd::structRec rec = mylsd::RectangleConverter(
            reg, magMap, aliPro, degThre);
        bool tr_seed = getenv("TRACE_SEED") &&
            i == (size_t)atol(getenv("TRACE_SEED"));
        if (tr_seed) {
            // replicate Refiner's threshold computation for inspection
            // (myLSD.cpp:839-856)
            double den0 = reg.num / (sqrt(pow(rec.x1 - rec.x2, 2) +
                pow(rec.y1 - rec.y2, 2)) * rec.wid);
            std::printf("REFINE den %.17g wid %.17g\n", den0, rec.wid);
            int oriX = reg.x, oriY = reg.y;
            double cenDeg = degMap.ptr<double>(oriY)[oriX];
            double difSum = 0, squSum = 0; int ptNum = 0;
            for (int k = 0; k < reg.num; k++) {
                if (sqrt(pow(oriX - reg.regPts_x[k], 2) +
                         pow(oriY - reg.regPts_y[k], 2)) < rec.wid) {
                    double dd = degMap.ptr<double>(reg.regPts_y[k])[reg.regPts_x[k]] - cenDeg;
                    while (dd <= -pi) dd += 2 * pi;
                    while (dd > pi) dd -= 2 * pi;
                    difSum += dd; squSum += dd * dd; ptNum++;
                }
            }
            double meanDif = difSum / (ptNum * 1.0);
            double newThre = 2.0 * sqrt((squSum - 2 * meanDif * difSum) /
                (ptNum * 1.0) + meanDif * meanDif);
            std::printf("RETHRE %d %.17g %.17g %.17g\n", ptNum, difSum,
                        squSum, newThre);
        }
        mylsd::structRefiner RF = mylsd::Refiner(
            reg, rec, denThre, degMap, usedMap, RG.curMap, magMap);
        reg = RF.reg; rec = RF.rec;
        if (tr_seed)
            std::printf("POSTREFINE %d %d\n", (int)RF.boolean, reg.num);
        if (!RF.boolean) {
            std::printf("SEED %zu %d %d %d refine_fail\n", i, xIdx,
                        yIdx, reg.num);
            continue;
        }
        mylsd::structRectangleImprover RI = mylsd::RectangleImprover(
            rec, degMap, logNT);
        rec = RI.rec;
        int accepted = RI.logNFA > 0;
        std::printf("SEED %zu %d %d %d ok %.17g %.17g %.17g %.17g "
                    "%.17g %.17g %.17g %d\n",
                    i, xIdx, yIdx, reg.num, rec.x1, rec.y1, rec.x2,
                    rec.y2, rec.wid, rec.p, RI.logNFA, accepted);
        for (int y = 0; y < newMapRow; y++)
            for (int x = 0; x < newMapCol; x++)
                if (RF.curMap.ptr<uint8_t>(y)[x] == 1)
                    usedMap.ptr<uint8_t>(y)[x] = accepted ? 1 : 2;
        long n1 = 0, n2 = 0, hx = 0, h1 = 0;
        for (int y = 0; y < newMapRow; y++)
            for (int x = 0; x < newMapCol; x++) {
                uint8_t u = usedMap.ptr<uint8_t>(y)[x];
                if (u == 1) { n1++; h1 += (y * 131071L + x) * (x + 7); }
                else if (u == 2) { n2++; hx += y * 1315423911L + x; }
            }
        std::printf("USED %ld %ld %ld %ld\n", n1, n2, hx, h1);
    }
    return 0;
}
