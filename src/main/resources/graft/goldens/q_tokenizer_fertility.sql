SELECT CAST("source" AS VARCHAR) AS "source", CAST("n_docs" AS BIGINT) AS "n_docs", CAST("sum_words" AS BIGINT) AS "sum_words", CAST("sum_uni_pieces" AS BIGINT) AS "sum_uni_pieces", CAST("sum_bpe_pieces" AS BIGINT) AS "sum_bpe_pieces"
FROM (VALUES
('src0', 25, 1435, 1494, 4768),
('src1', 25, 1540, 1590, 5051),
('src10', 25, 1303, 1357, 4254),
('src11', 25, 1522, 1566, 4985),
('src12', 25, 1272, 1317, 4101),
('src13', 25, 1553, 1593, 5007),
('src14', 25, 1318, 1361, 4335),
('src15', 25, 1298, 1354, 4202),
('src16', 25, 1351, 1400, 4414),
('src17', 25, 1373, 1413, 4388),
('src18', 25, 1364, 1409, 4519),
('src19', 25, 1147, 1187, 3734),
('src2', 25, 1407, 1453, 4594),
('src3', 25, 1384, 1436, 4532),
('src4', 25, 1294, 1346, 4203),
('src5', 25, 1329, 1372, 4300),
('src6', 25, 1266, 1311, 4130),
('src7', 25, 1507, 1554, 4834),
('src8', 25, 1136, 1177, 3767),
('src9', 25, 1366, 1409, 4441)
) AS t("source", "n_docs", "sum_words", "sum_uni_pieces", "sum_bpe_pieces")
ORDER BY "source", "n_docs", "sum_words", "sum_uni_pieces", "sum_bpe_pieces"
